package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Interleaved A/B for the round-15 "materialize-before-sort" fix on
  * expression-heavy final ORDER BYs (VERDICT #6): the range
  * partitioner's bounds sampling executes the sort's child once ahead
  * of the real exchange, so a compute-dense projection under the sort
  * evaluates TWICE. Arm B inserts a round-robin exchange between the
  * projection and the sort: AQE materializes that stage once, so the
  * sampling pass reads shuffle bytes instead of re-running the
  * expressions. Cost: one extra narrow-row shuffle.
  *
  * Usage: runMain graft.tools.SortMatProbe [reps] (default 4)
  */
object SortMatProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-sortmat-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()

    def timeIt(label: String, df: => DataFrame): Unit = {
      val (_, m) = graft.engine.Metrics.measure(spark) {
        graft.util.Exec.drain(df)
      }
      println(f"== $label%-22s ${m.wallMs / 1e3}%8.2f s  " +
        f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, tasks ${m.tasks}%d]")
      spark.sharedState.cacheManager.clearCache()
    }

    // the production expressions, restated (SubstrProf pattern) so the
    // two arms differ ONLY in the pre-sort barrier
    val geoExprs = Seq(
      "l_quantity * 2.0 - 50.0 AS lat",
      "(l_extendedprice % 360.0) - 180.0 AS lon",
      "CAST(l_suppkey % 360 AS DOUBLE) AS track",
      "l_tax * 2000.0 AS speed_ms")
    val geoPredict = Seq(
      "round(degrees(asin(sin(radians(lat)) * cos(speed_ms * 300.0 / 6371000.0)" +
        " + cos(radians(lat)) * sin(speed_ms * 300.0 / 6371000.0)" +
        " * cos(radians(track)))), 4) + 0.0 AS pred_lat",
      "round(degrees(radians(lon) + atan2(" +
        "sin(radians(track)) * sin(speed_ms * 300.0 / 6371000.0) * cos(radians(lat)), " +
        "cos(speed_ms * 300.0 / 6371000.0) - sin(radians(lat)) * sin(asin(" +
        "sin(radians(lat)) * cos(speed_ms * 300.0 / 6371000.0)" +
        " + cos(radians(lat)) * sin(speed_ms * 300.0 / 6371000.0)" +
        " * cos(radians(track)))))), 4) + 0.0 AS pred_lon")
    def trig(withBarrier: Boolean): DataFrame = {
      val projected = graft.engine.Tables(spark, dir, "lineitem")
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr(Seq("l_orderkey", "l_linenumber") ++ geoExprs: _*)
        .selectExpr(Seq("l_orderkey", "l_linenumber") ++ geoPredict: _*)
      val pre =
        if (withBarrier)
          projected.repartition(spark.sparkContext.defaultParallelism)
        else projected
      pre.orderBy(col("l_orderkey"), col("l_linenumber"),
        col("pred_lat"), col("pred_lon"))
    }
    def base = trig(withBarrier = false)
    def matted = trig(withBarrier = true)

    // warmup both arms
    timeIt("warmup base", base)
    timeIt("warmup matted", matted)
    (1 to reps).foreach { _ =>
      timeIt("geo base", base)
      timeIt("geo matted", matted)
    }
    spark.stop()
  }
}
