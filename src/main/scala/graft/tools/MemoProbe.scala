package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution probe for the islands memo build (round-9 directive 1):
  * times `Llm.substrIslandSummary` cold and warm in a quiet JVM, then
  * replays the driver-bench context (N other queries with Bench's
  * per-query cache clearing) and re-times the build — separating
  * "the plan regressed" from "the bench context regressed".
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_PREQ=<n> MemoProbe */
object MemoProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val preN = sys.env.getOrElse("SPARK_GRAFT_PREQ", "0").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/documents.parquet").count()

    def build(tag: String): Unit = {
      val t0 = System.nanoTime()
      val p = java.nio.file.Files.createTempDirectory("probe_islands")
        .toString
      graft.ops.Llm.substrIslandSummary(spark, dir)
        .write.mode("overwrite").parquet(p)
      println(f"MEMOPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.util.Fs.deleteRecursively(p)
    }

    // the FULL bench entry (memo build + removal serve), cold and
    // warm — splits the bench row into its two addends so a slow
    // reading attributes to "build regressed" vs "serve regressed"
    // vs "host/context noise"
    def full(tag: String): Unit = {
      val t0 = System.nanoTime()
      graft.util.Exec.drain(
        graft.SparkEntry.queries("q_llm_dedup_substr_rm")(spark, dir))
      println(f"MEMOPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    build("quiet-cold")
    build("quiet-warm")
    graft.ops.Llm.invalidateIslandsCache()
    full("quiet-full-cold")
    full("quiet-full-warm")
    if (preN > 0) {
      // replay the bench context: run the first N queries in bench
      // (Map-iteration) order with Bench's between-query clearing
      val qs = graft.SparkEntry.queries.toSeq.take(preN)
      qs.foreach { case (name, fn) =>
        try graft.util.Exec.drain(fn(spark, dir))
        catch { case e: Throwable =>
          System.err.println(s"preq $name failed: $e") }
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        System.gc()
      }
      graft.ops.Llm.invalidateIslandsCache()
      build(s"post-$preN-queries")
      build(s"post-$preN-warm")
      graft.ops.Llm.invalidateIslandsCache()
      full(s"post-$preN-full-cold")
      full(s"post-$preN-full-warm")
    }
    spark.stop()
  }
}
