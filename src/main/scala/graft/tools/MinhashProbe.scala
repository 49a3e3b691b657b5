package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Deep-factor isolation probe for the minhash-native pipeline's
  * materialization strategy — the diagnosis behind the round-12
  * DeepProbe x1000 failure (AGGREGATE_OUT_OF_MEMORY): the signature
  * build alone passes x1000 with zero spill (SigProbe), so the
  * suspect is the pipeline's eager localCheckpoint of the full
  * corpus shingle arrays, whose MEMORY_AND_DISK blocks compete with
  * the aggregate's execution memory in the same unified pool.
  *
  * Variants:
  *  - checkpoint: the production entry as-is (docs localCheckpointed)
  *  - recompute:  same pipeline, docs NOT materialized — the shingle
  *    derivation is map-only and re-runs per consumer (3x compute,
  *    zero storage-pool pressure)
  *
  * Usage: runMain graft.tools.MinhashProbe [factor...] (default: 300 1000)
  *   SPARK_GRAFT_MH_PARTS    shuffle partitions (default 64) — the
  *                           spill-vs-partitioning experiment knob
  *   SPARK_GRAFT_MH_VARIANTS comma list of checkpoint,recompute
  *                           (default both)
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(300, 1000) else args.toSeq.map(_.toInt)
    val parts = sys.env.getOrElse("SPARK_GRAFT_MH_PARTS", "64")
    val variants = sys.env.getOrElse("SPARK_GRAFT_MH_VARIANTS",
      "checkpoint,recompute").split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-minhash-probe")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    def timeIt(label: String, thunk: () => Unit): Unit = {
      val (err, m) = graft.engine.Metrics.measure(spark)(
        try { thunk(); None }
        catch { case t: Throwable =>
          System.err.println(s"== $label FAILED: ${t.toString.take(300)}")
          Some(t) })
      if (err.isEmpty)
        println(f"== $label%-28s ${m.wallMs / 1e3}%8.1f s   " +
          f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, " +
          f"spill ${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576}%d MB, " +
          f"tasks ${m.tasks}%d]")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // untimed warmup at base scale (both variants)
    graft.util.Exec.drain(graft.ops.Llm.minhashNativePairs(spark, src, materialize = true))
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    graft.util.Exec.drain(graft.ops.Llm.minhashNativePairs(spark, src, materialize = false))

    for (factor <- factors) {
      val dst = Files.createTempDirectory(s"graft_mh_x$factor").toString
      Inflate.documentsOnly(spark, src, dst, factor)
      if (variants("checkpoint"))
        timeIt(s"x$factor checkpoint (p=$parts)", () => graft.util.Exec.drain(
          graft.ops.Llm.minhashNativePairs(spark, dst, materialize = true)))
      if (variants("recompute"))
        timeIt(s"x$factor recompute (p=$parts)", () => graft.util.Exec.drain(
          graft.ops.Llm.minhashNativePairs(spark, dst, materialize = false)))
      graft.util.Fs.deleteRecursively(dst)
    }
    spark.stop()
  }
}
