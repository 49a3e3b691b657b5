package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14: does spreading the tiny-file documents scan before the
  * map-heavy shingle derivation pay? Times the signature aggregation
  * (the map-side tokenize+shingle+hash work) as-is vs behind a
  * round-robin repartition to defaultParallelism. */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.util.Exec.drain(df)
        println(f"SPREAD $name rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    val base = graft.engine.Tables(spark, dir, "documents")
    val spreadBase = base.repartition(spark.sparkContext.defaultParallelism)
    t("sigs as-is")(graft.ops.Llm.bandedSignatures(
      graft.ops.Llm.shingleDocs(base)))
    t("sigs spread")(graft.ops.Llm.bandedSignatures(
      graft.ops.Llm.shingleDocs(spreadBase)))
    t("pairs as-is")(graft.ops.Llm.dedupMinhashNative(spark, dir))
    spark.stop()
  }
}
