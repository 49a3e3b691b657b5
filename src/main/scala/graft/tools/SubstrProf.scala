package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost profiler for the substring-dedup island build — the
  * Prof pattern applied to the one plan the x100 probe flagged
  * superlinear (6.85x for 10x data, round 7). Times each stage of
  * `Llm.substrIslandSummary` separately with physical counters so
  * the superlinear term is attributable: gram explode+digest, df-cap
  * aggregate, semi join, gram self-join, islands window.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.SubstrProf"
  */
object SubstrProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      // experiment knob: AQE starts at this many partitions and
      // coalesces down — the per-task state-size lever the x100 spill
      // diagnosis points at
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/documents.parquet").count()

    val n = 6
    def stage(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val (_, m) = graft.engine.Metrics.measure(spark) {
        graft.util.Exec.drain(df)
      }
      println(f"SUBSTRPROF $name%-22s ${m.wallMs / 1e3}%8.2f s  " + m.pretty)
    }

    val slices = (0 until n)
      .map(i => s"slice(t, ${i + 1}, greatest(size(t) - ${n - 1}, 0))")
      .mkString(",")
    val fields = (0 until n).map(i => s"p['$i']").mkString(", ")
    def tokenized = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')")
        .as("t"))
    def allGramsLazy = tokenized
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"transform(arrays_zip($slices), p -> md5(concat_ws(' ', $fields)))"))
        .as(Seq("pos", "g")))

    // every intermediate is CHECKPOINTED after its timed stage, so
    // each later stage's window contains only its own marginal work —
    // un-materialized inputs would re-execute every earlier stage
    // inside each later timing, attributing an upstream regression to
    // whichever stage happens to be read last (the exact opposite of
    // the per-stage attribution this tool exists for)
    stage("gram explode+digest")(allGramsLazy)
    val allGrams = allGramsLazy.localCheckpoint(true)
    val rareLazy = allGrams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= 64)
      .select(col("g"))
    stage("df-cap aggregate")(rareLazy)
    val rare = rareLazy.localCheckpoint(true)
    val gramsLazy = allGrams.join(rare.hint("merge"), Seq("g"), "left_semi")
    stage("rare semi join")(gramsLazy)
    val grams = gramsLazy.localCheckpoint(true)
    val a = grams.as("a")
    val b = grams.as("b")
    val matchedLazy = a.join(b,
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.pos").as("pa"), (col("a.pos") - col("b.pos")).as("delta"))
    stage("gram self-join")(matchedLazy)
    val matched = matchedLazy.localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d1"), col("d2"), col("delta")).orderBy(col("pa"))
    stage("islands window+summary")(
      matched.withColumn("island", col("pa") - row_number().over(w))
        .groupBy(col("d1"), col("d2"), col("delta"), col("island"))
        .agg(min(col("pa")).as("pa0"), count(lit(1)).as("m"))
        .drop("island"))
    spark.stop()
  }
}
