package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Deep-scale record for the MULTIMODAL family — the one family the
  * round-13 verdict flagged as having no x100+ row. The four q_mm_*
  * entries run against inflated documents: the codec round-trips
  * (binary_meta / resize / framesample) are map-only mapPartitions
  * passes and must scale linearly; q_mm_phash is the banded
  * near-dup join whose pair work SURVEY claims stays bounded because
  * the synthetic dup-group modulus (m = n/12) keeps group size
  * constant as the corpus grows — this probe measures the claim.
  *
  * Usage: runMain graft.tools.MmProbe [factor...] (default: 30 100)
  *   SPARK_GRAFT_MM_NAMES comma list to restrict the probed entries
  *   (default: all five — the x300 cell of the doc-pair expansion
  *   face is output-bound at ~6e9 rows by contract, so deep factors
  *   pair with SPARK_GRAFT_MM_NAMES=q_mm_phash_classes)
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(30, 100) else args.toSeq.map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-mm-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val allNames = Seq("q_mm_binary_meta", "q_mm_resize",
      "q_mm_framesample", "q_mm_phash", "q_mm_phash_classes")
    val names = sys.env.get("SPARK_GRAFT_MM_NAMES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(allNames)
    // untimed base-scale warmup (codegen + reader init)
    for (n <- names)
      try graft.util.Exec.drain(graft.SparkEntry.queries(n)(spark, src))
      catch { case t: Throwable => System.err.println(s"warmup $n: $t") }
    val results =
      scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
    for (factor <- factors) {
      val dst = Files.createTempDirectory(s"graft_mm_x$factor").toString
      Inflate.documentsOnly(spark, src, dst, factor)
      for (n <- names) {
        val (err, m) = graft.engine.Metrics.measure(spark)(
          try { graft.util.Exec.drain(
            graft.SparkEntry.queries(n)(spark, dst)); None }
          catch { case t: Throwable =>
            System.err.println(s"== x$factor $n FAILED: ${t.toString.take(300)}")
            Some(t) })
        if (err.isEmpty) {
          results((n, factor)) = m.wallMs / 1e3
          println(f"== x$factor $n%-20s ${m.wallMs / 1e3}%8.1f s   " +
            f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, " +
            f"spill ${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576}%d MB, " +
            f"tasks ${m.tasks}%d]")
        }
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      graft.util.Fs.deleteRecursively(dst)
    }
    println("\n== multimodal deep trend (seconds)")
    for (n <- names) {
      val cells = factors.map(f =>
        results.get((n, f)).map(s => f"x$f%-5d ${s}%8.1f s")
          .getOrElse(f"x$f%-5d   FAILED"))
      println(f"== $n%-20s ${cells.mkString("  ")}")
    }
    spark.stop()
  }
}
