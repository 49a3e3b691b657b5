package graft.tools

import org.apache.spark.sql.SparkSession

/** Comparative anchor: run the full 22-query TPC-H macro suite at an
  * inflated factor (x10 over sf0.1 ~ sf1) against a PERSISTENT copy
  * of the inflated tables, so an external single-node engine (DuckDB,
  * via tools/tpch_anchor_duck.py) can execute the same oracle SQL on
  * the same parquet and give the evidence chain its first external
  * datapoint — the 2x bench gate otherwise self-references round 1.
  *
  * Each query runs twice and reports the SECOND time: both engines
  * get a warm-cache measurement (DuckDB's harness does the same), so
  * the comparison prices the plans, not page-cache luck.
  *
  * Usage: runMain graft.tools.TpchAnchor [factor] [dstDir]
  */
object TpchAnchor {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val dst = args.lift(1).getOrElse(s"/tmp/graft_tpch_x$factor")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-tpch-anchor")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Inflate.ensure(spark, "/root/testdata/sf0.1", dst, factor)

    import graft.ops._
    val suite: Seq[(String, graft.ops.Q)] = Seq(
      "q1" -> Aggs.tpchQ1, "q2" -> Joins.tpchQ2, "q3" -> Joins.tpchQ3,
      "q4" -> Joins.tpchQ4, "q5" -> Joins.tpchQ5, "q6" -> Aggs.tpchQ6,
      "q7" -> Joins.tpchQ7, "q8" -> Joins.tpchQ8, "q9" -> Joins.tpchQ9,
      "q10" -> Joins.tpchQ10, "q11" -> Joins.tpchQ11, "q12" -> Joins.tpchQ12,
      "q13" -> Joins.tpchQ13, "q14" -> Joins.tpchQ14, "q15" -> Joins.tpchQ15,
      "q16" -> Joins.tpchQ16, "q17" -> Joins.tpchQ17, "q18" -> Joins.tpchQ18,
      "q19" -> Joins.tpchQ19, "q20" -> Joins.tpchQ20, "q21" -> Joins.tpchQ21,
      "q22" -> Joins.tpchQ22)

    // JVM/codegen warmup outside the timed runs
    spark.read.parquet(s"$dst/lineitem.parquet").count()

    val times = suite.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.util.Exec.drain(fn(spark, dst))
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = once()
      println(f"== $name%-4s cold $cold%7.2f s  warm $warm%7.2f s")
      name -> warm
    }
    val json = times.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val line =
      s"""{"anchor":"tpch_x$factor","dst":"$dst","total_s":${times.map(_._2).sum},"queries":$json}"""
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dst/spark_times.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
