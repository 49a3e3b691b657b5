package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot: rounds/edges of the dedup-clusters convergence at a dir,
  * plus the pairs-vs-loop wall split (round-14 optimization probe). */
object ClusterStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    val t0 = System.nanoTime()
    val nPairs = graft.ops.Llm.dedupMinhashNative(spark, dir).count()
    val t1 = System.nanoTime()
    val (rounds, edges) = graft.ops.Llm.clusterConvergenceStats(spark, dir)
    val t2 = System.nanoTime()
    println(f"CSP pairs=$nPairs pairsWall=${(t1 - t0) / 1e9}%.2f s  " +
      f"rounds=$rounds edges=$edges loopWall=${(t2 - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
