package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Head-to-head of the two banded-signature builders at deep factors —
  * the measurement behind the round-12 signature dispatch:
  *
  *  - GROUPED ([[graft.ops.Llm.bandedSignatures]]): explode(shingles)
  *    -> groupBy(doc_id) with 12 min aggregates. Whole-stage codegen,
  *    but its shuffle AND its aggregation hash map are sized by
  *    corpus x shingles — the x300 DeepProbe row spilled 4.4 GB and
  *    x1000 died with AGGREGATE_OUT_OF_MEMORY in the partial agg.
  *  - MAP-ONLY ([[graft.ops.Llm.mapOnlyBandedSignatures]]):
  *    array_min(transform(...)) per row, 12 passes over the row's own
  *    shingle array. HOFs are CodegenFallback, but there is ZERO
  *    shuffle and zero aggregation state — memory is bounded by one
  *    row regardless of corpus size.
  *
  * Both emit bitwise-identical band keys (LlmSpec pins equality).
  * Usage: runMain graft.tools.SigProbe [factor...] (default: 1 300)
  */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(1, 300) else args.toSeq.map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-sig-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    def docsAt(dir: String) = graft.ops.Llm.shingleDocsAt(spark, dir)
    def timeIt(label: String, thunk: () => Unit): Unit = {
      val (err, m) = graft.engine.Metrics.measure(spark)(
        try { thunk(); None }
        catch { case t: Throwable =>
          System.err.println(s"== $label FAILED: $t"); Some(t) })
      if (err.isEmpty)
        println(f"== $label%-28s ${m.wallMs / 1e3}%8.1f s   " +
          f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, " +
          f"spill ${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576}%d MB, " +
          f"tasks ${m.tasks}%d]")
    }
    // untimed warmup: codegen + parquet reader init must not be
    // charged to the first timed factor (the DeepProbe x300 lesson)
    graft.util.Exec.drain(graft.ops.Llm.bandedSignaturesGrouped(docsAt(src)))
    graft.util.Exec.drain(graft.ops.Llm.mapOnlyBandedSignatures(docsAt(src)))

    for (factor <- factors) {
      val dir =
        if (factor == 1) src
        else {
          val dst = Files.createTempDirectory(s"graft_sig_x$factor").toString
          Inflate.documentsOnly(spark, src, dst, factor)
          dst
        }
      timeIt(s"x$factor grouped",
        () => graft.util.Exec.drain(
          graft.ops.Llm.bandedSignaturesGrouped(docsAt(dir))))
      timeIt(s"x$factor map-only",
        () => graft.util.Exec.drain(
          graft.ops.Llm.mapOnlyBandedSignatures(docsAt(dir))))
      if (factor != 1) graft.util.Fs.deleteRecursively(dir)
    }
    spark.stop()
  }
}
