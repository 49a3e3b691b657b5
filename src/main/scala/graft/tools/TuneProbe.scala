package graft.tools

import org.apache.spark.sql.SparkSession

/** Head-to-head for the AQE coalesce floor tune (round-13): the
  * FloorProbe finding (parallelismFirst=false, −28% on the modal tiny
  * shape) regressed CPU-DENSE mid-size shuffles in the full bench —
  * q_join_editdist 3.5 s → 9.3 s, because with bytes-first sizing a
  * ~60 MB shuffle coalesces toward the 64 MB advisory target = ~1
  * task, serializing the levenshtein verify that wants all 32 cores.
  * Configs:
  *   A parallelism-first (Spark default)        — the round-12 regime
  *   B bytes-first, min 8m, advisory 64m (dflt) — the naive tune
  *   C bytes-first, min 1m, advisory 4m         — bytes-sized floors
  *     for tiny shuffles WITHOUT starving mid-size CPU-dense ones
  *
  * Times a regressed set and a modal set at sf0.1, two reps, min.
  *
  * Usage: runMain graft.tools.TuneProbe
  */
object TuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-tune-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").count()

    val queries = Seq(
      // regressed in the round-13 bench under config B
      "q_join_editdist", "q_agg_percentile", "q_skyline",
      "q_filter_quantile", "q_llm_dedup_ngram",
      // modal cheap shapes (the floor win candidates)
      "q_tpch_q14", "q_join_left_enrich", "q_agg_groupby_multi")
    val configs = Seq(
      "A parallelism-first" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"),
      "B bytes-first 8m/64m" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"),
      "C bytes-first 1m/4m" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m"))

    // warmup every query once (codegen), config A
    configs.head._2.foreach { case (k, v) => spark.conf.set(k, v) }
    for (q <- queries)
      try graft.util.Exec.drain(graft.SparkEntry.queries(q)(spark, dir))
      catch { case _: Throwable => () }

    val results =
      scala.collection.mutable.LinkedHashMap.empty[(String, String), Double]
    for ((label, confs) <- configs) {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      for (q <- queries) {
        val ts = (0 until 2).map { _ =>
          // Tables.tune must not undo the experiment between reps
          confs.foreach { case (k, v) => spark.conf.set(k, v) }
          val t0 = System.nanoTime()
          val ok =
            try { graft.util.Exec.drain(
              graft.SparkEntry.queries(q)(spark, dir)); true }
            catch { case t: Throwable =>
              System.err.println(s"$label $q FAILED: $t"); false }
          // clock BEFORE the cache clear: teardown cost varies with
          // what each config materialized, and charging it to the
          // timed cell skews exactly the A/B/C comparison this tool
          // exists to adjudicate (round-13 review)
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sharedState.cacheManager.clearCache()
          // a failed run must poison the cell, not land its (fast,
          // meaningless) wall time in the comparison this tool exists
          // to adjudicate
          if (ok) dt else Double.NaN
        }
        results((q, label)) = if (ts.exists(_.isNaN)) Double.NaN else ts.min
      }
    }
    println(f"\n== ${"query"}%-22s ${configs.map(_._1).mkString("  ")}")
    for (q <- queries) {
      val cells = configs.map { case (l, _) =>
        val v = results((q, l))
        (if (v.isNaN) "  FAILED  " else f"$v%8.2f s").padTo(l.length, ' ') }
      println(f"== $q%-22s ${cells.mkString("  ")}")
    }
    for ((l, _) <- configs) {
      val vs = queries.map(q => results((q, l)))
      val tag = if (vs.exists(_.isNaN)) " (INCOMPLETE: failures)" else ""
      println(f"== TOTAL $l%-20s ${vs.filterNot(_.isNaN).sum}%8.2f s$tag")
    }
    spark.stop()
  }
}
