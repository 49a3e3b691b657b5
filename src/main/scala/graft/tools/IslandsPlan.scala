package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of the substring-islands BUILD
  * (`Llm.substrIslandSummary`) under each requested gram strategy —
  * the per-query plans only show the memoized table read, so the
  * optimization-evidence plan must come from the build itself.
  *
  * Usage: runMain graft.tools.IslandsPlan <outDir> [strategy ...]
  */
object IslandsPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/islands_plans")
    val strategies =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("recompute-bin", "repart-bin")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val prev = graft.ops.Llm.substrGramStrategy
    try strategies.foreach { s =>
      graft.ops.Llm.substrGramStrategy = s
      val txt = graft.ops.Llm.substrIslandSummary(spark, "/root/testdata/sf0.1")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"islands_build_$s.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"wrote $p")
    } finally graft.ops.Llm.substrGramStrategy = prev
    spark.stop()
  }
}
