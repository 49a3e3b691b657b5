package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Deep-factor head-to-head for the substring-dedup islands BUILD's
  * gram-frame materialization strategy — the MinhashProbe pattern
  * applied to this family's own wall (round-12 cells: x1 4.96 s →
  * x30 16.91 s → x100 95.1 s, the x30→x100 step of 5.6 for 3.3x data
  * is spill onset on 32 fixed cores). The suspect is the same one the
  * minhash x1000 OOM convicted: an eager localCheckpoint of a
  * corpus-scale frame (here the POSITIONAL GRAM frame — one row per
  * token position, 32-char hex digest each) whose MEMORY_AND_DISK
  * blocks compete with the join/window execution memory in the same
  * unified pool.
  *
  * Variants (see Llm.substrGramStrategy):
  *  - checkpoint      round-12 status quo (hex digests, full frame
  *                    materialized)
  *  - checkpoint-bin  16-byte binary digests, full frame materialized
  *  - thinrare-bin    only the rare-digest set materialized (one
  *                    16-byte row per distinct df-capped gram);
  *                    positional frame recomputes, self-join pinned
  *                    sort-merge for exchange reuse
  *  - recompute-bin   nothing materialized
  *
  * Each timed build writes the summary to parquet (the memoized
  * islandSummaryTable's real cost shape, as MemoProbe prices it).
  *
  * Usage: runMain graft.tools.IslandsProbe [factor...] (default: 30 100)
  *   SPARK_GRAFT_ISL_VARIANTS comma list (default all four)
  *   SPARK_GRAFT_ISL_PARTS    shuffle partitions (default 32 — the
  *                            bench session's setting)
  */
object IslandsProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(30, 100) else args.toSeq.map(_.toInt)
    val parts = sys.env.getOrElse("SPARK_GRAFT_ISL_PARTS", "32")
    val variants = sys.env.getOrElse("SPARK_GRAFT_ISL_VARIANTS",
      "checkpoint,checkpoint-bin,thinrare-bin,recompute-bin")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-islands-probe")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    def buildOnce(label: String, dir: String): Unit = {
      val out = Files.createTempDirectory("graft_islprobe").toString
      val (err, m) = graft.engine.Metrics.measure(spark)(
        try {
          graft.ops.Llm.substrIslandSummary(spark, dir)
            .write.mode("overwrite").parquet(out)
          None
        } catch { case t: Throwable =>
          System.err.println(s"== $label FAILED: ${t.toString.take(300)}")
          Some(t)
        })
      if (err.isEmpty)
        println(f"== $label%-34s ${m.wallMs / 1e3}%8.1f s   " +
          f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, " +
          f"spill ${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576}%d MB, " +
          f"tasks ${m.tasks}%d, spread ${m.taskSpread}%.1f]")
      graft.util.Fs.deleteRecursively(out)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }

    // untimed warmup at base scale per variant (codegen + reader init)
    for (v <- variants) {
      graft.ops.Llm.substrGramStrategy = v
      try graft.util.Exec.drain(graft.ops.Llm.substrIslandSummary(spark, src))
      catch { case _: Throwable => () }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    for (factor <- factors) {
      // factor 1 measures the RAW fixture in place — its single-row-
      // group scan shape is exactly what the bench prices; an x1
      // inflation would rewrite it multi-file and hide the spread
      // arm's whole effect
      val dst =
        if (factor == 1) src
        else {
          val d = Files.createTempDirectory(s"graft_isl_x$factor").toString
          println(s"== inflating documents x$factor -> $d")
          Inflate.documentsOnly(spark, src, d, factor)
          d
        }
      for (v <- variants) {
        graft.ops.Llm.substrGramStrategy = v
        buildOnce(s"x$factor $v (p=$parts)", dst)
      }
      if (factor != 1) graft.util.Fs.deleteRecursively(dst)
    }
    // restore the SHIPPED default (the round-15 head-to-head winner)
    graft.ops.Llm.substrGramStrategy = "repart-bin"
    spark.stop()
  }
}
