package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the PER-QUERY FIXED FLOOR the suite anchor
  * exposes (round-12 verdict #6): Spark 1.41x DuckDB ex-swing at x10
  * is a fixed per-query overhead, not throughput — the gap SHRINKS as
  * data grows (round-6 anchor), so the lever is the floor, not the
  * operators. This probe prices the floor's layers directly, each as
  * the MEDIAN of `reps` runs with a fresh DataFrame per run (so every
  * rep pays analysis; codegen/scan caches behave as they do across a
  * real suite's distinct plans):
  *
  *  1. `range-count`     — job scheduling + action floor (no files,
  *                         no shuffle, one stage);
  *  2. `scan-count`      — + file listing, footer read, vectorized
  *                         reader init on a tiny parquet;
  *  3. `agg-1shuffle`    — + one exchange (AQE stage barrier, shuffle
  *                         write/read of a handful of rows);
  *  4. `agg-sort-2shuffle` — + a second exchange (second AQE
  *                         materialization barrier);
  *  5. (3) with AQE OFF  — what the adaptive re-plan barriers cost on
  *                         tiny inputs;
  *  6. (3) with WHOLE-STAGE CODEGEN OFF — what Janino compile costs
  *                         per distinct tiny plan;
  *  7. (3) with coalescePartitions.parallelismFirst=false +
  *                         minPartitionSize=8m — the AQE floor tune
  *                         that collapses tiny shuffles to one task.
  *
  * The output table is the floor decomposition BASELINE.md documents;
  * any layer worth >100 ms/query on 32 cores is a candidate for a
  * config default in the bench session.
  *
  * Usage: runMain graft.tools.FloorProbe [reps]   (default 15)
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.isEmpty) 15 else args.head.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-floor-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    // untimed warmup: reader init, codegen of each probe shape
    spark.read.parquet(s"$dir/nation.parquet").count()

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // vary an inert literal per rep so every run is a DISTINCT plan:
    // a repeated identical plan would hit the codegen cache in a way
    // a real suite of distinct queries does not
    def time(label: String, confs: Map[String, String] = Map.empty)(
        mk: Int => org.apache.spark.sql.DataFrame): Unit = {
      val saved = confs.keys.map(k => k -> spark.conf.get(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // one untimed run for shape-level one-time costs shared by
        // every variant (broadcast thresholds etc.)
        graft.util.Exec.drain(mk(-1))
        val ts = (0 until reps).map { i =>
          val t0 = System.nanoTime()
          graft.util.Exec.drain(mk(i))
          (System.nanoTime() - t0) / 1e3 // micros
        }
        println(f"== $label%-42s median ${median(ts) / 1e3}%8.1f ms   " +
          f"min ${ts.min / 1e3}%8.1f ms  max ${ts.max / 1e3}%8.1f ms")
      } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    time("range-count (schedule floor)") { i =>
      spark.range(100 + i).select(count(lit(1)).as("n"))
    }
    time("scan-count (+listing/footer)") { i =>
      spark.read.parquet(s"$dir/nation.parquet")
        .filter(col("n_nationkey") >= i - 1000)
        .select(count(lit(1)).as("n"))
    }
    def agg1(i: Int) =
      spark.read.parquet(s"$dir/nation.parquet")
        .filter(col("n_nationkey") >= i - 1000)
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    time("agg-1shuffle (+1 exchange)")(agg1)
    time("agg-sort-2shuffle (+2nd exchange)") { i =>
      agg1(i).orderBy(col("n").desc)
    }
    time("agg-1shuffle AQE OFF",
      Map("spark.sql.adaptive.enabled" -> "false"))(agg1)
    time("agg-1shuffle CODEGEN OFF",
      Map("spark.sql.codegen.wholeStage" -> "false"))(agg1)
    time("agg-1shuffle coalesce-floor tune",
      Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8m"))(agg1)
    // the same tune on a REAL small query shape: a broadcast join +
    // agg over the sf0.001 facts (the suite's modal shape)
    def joinAgg(i: Int) =
      spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") >= i - 1000000)
        .join(broadcast(spark.read.parquet(s"$dir/customer.parquet")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
    time("join-agg sf0.001 (modal shape)")(joinAgg)
    time("join-agg coalesce-floor tune",
      Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8m"))(joinAgg)
    spark.stop()
  }
}
