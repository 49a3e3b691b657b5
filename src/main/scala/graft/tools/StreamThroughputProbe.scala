package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.VersionedTable
import graft.streaming.{Pipelines, StreamMetrics}

/** Sustained streaming-throughput record for the four production
  * gates (round-13 verdict #6): incremental dedup, decontamination,
  * ANN delta refresh, entity resolution — each fed a multi-trigger
  * stream of CONSTANT-size batches against corpus-scale (inflated)
  * artifacts, with per-trigger rows/duration read from the engine's
  * own StreamingQueryProgress (StreamMetrics). One stream per gate,
  * `maxFilesPerTrigger=1` + AvailableNow: every pre-written batch
  * file becomes its own trigger, so the record shows the SUSTAINED
  * cadence (trigger i+1 pays whatever state trigger i accreted —
  * unfolded delta rows, snapshot growth, output-table size), not a
  * one-shot gate cost.
  *
  * Usage: runMain graft.tools.StreamThroughputProbe [factor] [triggers]
  *        (default: factor 30, 8 triggers)
  */
object StreamThroughputProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(30)
    val triggers = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-throughput-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/root/testdata/sf0.1"
    val dst = Files.createTempDirectory(s"graft_stp_x$factor").toString
    println(s"== inflating documents+embeddings x$factor -> $dst")
    Inflate.documentsOnly(spark, src, dst, factor)
    Inflate.embeddingsOnly(spark, src, dst, factor)

    def report(gate: String, q: org.apache.spark.sql.streaming.StreamingQuery)
        : Unit = {
      val rows = StreamMetrics.perTrigger(q).filter(_.inputRows > 0)
      for (r <- rows)
        println(f"STP $gate%-12s x$factor trigger=${r.batchId}%2d " +
          f"in=${r.inputRows}%6d  ${r.durationMs}%6d ms  " +
          f"${r.inputRows * 1000.0 / math.max(r.durationMs, 1)}%8.0f rows/s")
      val totIn = rows.map(_.inputRows).sum
      val totMs = rows.map(_.durationMs).sum
      println(f"STP $gate%-12s x$factor SUSTAINED ${rows.size} triggers " +
        f"in=$totIn  ${totMs}%d ms  " +
        f"${totIn * 1000.0 / math.max(totMs, 1)}%8.0f rows/s")
    }

    def fileStream(dir: String, schema: String): DataFrame =
      spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)

    // ---- gate 1: incremental dedup -------------------------------
    // corpus-scale signature snapshot (the nightly advanceIncrSnapshot
    // artifact) over the INFLATED docs; constant 2k-doc batches
    // re-keyed from the x1 documents
    locally {
      val snap = Files.createTempDirectory("graft_stp_snap").toString
      val out = Files.createTempDirectory("graft_stp_dout").toString
      val ckpt = Files.createTempDirectory("graft_stp_dck").toString
      val feed = Files.createTempDirectory("graft_stp_dfeed").toString
      val corpus = spark.read.parquet(s"$dst/documents.parquet")
        .select(col("doc_id"), col("text"))
      println(s"== seeding incr-dedup snapshot (corpus = x$factor docs)")
      VersionedTable.commit(
        graft.ops.Llm.mapOnlyBandedSignatures(
          graft.ops.Llm.shingleDocs(corpus)), snap)
      val base = spark.read.parquet(s"$src/documents.parquet")
        .select(col("doc_id"), col("text")).limit(2000)
      (1 to triggers).foreach { i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text"))
          .coalesce(1).write.parquet(s"$feed/b$i")
      }
      val q = Pipelines.runStreamingIncrDedup(
        fileStream(feed, "doc_id LONG, text STRING"), snap, out, ckpt)
      q.awaitTermination()
      report("incr_dedup", q)
      Seq(snap, out, ckpt, feed).foreach(graft.util.Fs.deleteRecursively)
    }

    // ---- gate 2: decontamination --------------------------------
    // eval benchmark = 500 docs; constant 2k-doc batches
    locally {
      val out = Files.createTempDirectory("graft_stp_cout").toString
      val ckpt = Files.createTempDirectory("graft_stp_cck").toString
      val feed = Files.createTempDirectory("graft_stp_cfeed").toString
      val evalDocs = spark.read.parquet(s"$dst/documents.parquet")
        .select(col("doc_id"), col("text")).limit(500)
        .localCheckpoint(true)
      val base = spark.read.parquet(s"$src/documents.parquet")
        .select(col("doc_id"), col("text")).limit(2000)
      (1 to triggers).foreach { i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text"))
          .coalesce(1).write.parquet(s"$feed/b$i")
      }
      val q = Pipelines.runStreamingDecontam(
        fileStream(feed, "doc_id LONG, text STRING"), evalDocs, out, ckpt)
      q.awaitTermination()
      report("decontam", q)
      Seq(out, ckpt, feed).foreach(graft.util.Fs.deleteRecursively)
    }

    // ---- gate 3: ANN delta refresh ------------------------------
    // committed index over the INFLATED embeddings; constant 2k-vector
    // batches; NO fold between triggers — trigger i pays the overlay
    // accreted by triggers 1..i-1, the worst sustained shape
    locally {
      val idx = Files.createTempDirectory("graft_stp_idx").toString
      val ckpt = Files.createTempDirectory("graft_stp_ack").toString
      val feed = Files.createTempDirectory("graft_stp_afeed").toString
      println(s"== building ANN index (corpus = x$factor vectors)")
      graft.engine.AnnIndex.build(spark,
        spark.read.parquet(s"$dst/embeddings.parquet")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("e")), idx)
      val base = spark.read.parquet(s"$src/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      (1 to triggers).foreach { i =>
        base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
            col("e"))
          .coalesce(1).write.parquet(s"$feed/b$i")
      }
      val q = Pipelines.runStreamingAnnRefresh(
        fileStream(feed, "vec_id LONG, e ARRAY<DOUBLE>"), idx, ckpt,
        delta = true)
      q.awaitTermination()
      report("ann_delta", q)
      Seq(idx, ckpt, feed).foreach(graft.util.Fs.deleteRecursively)
    }

    // ---- gate 4: entity resolution ------------------------------
    // canon = the customer dictionary; constant 1.5k-record batches of
    // perturbed names (dropped character -> within edit distance 1)
    locally {
      val out = Files.createTempDirectory("graft_stp_eout").toString
      val ckpt = Files.createTempDirectory("graft_stp_eck").toString
      val feed = Files.createTempDirectory("graft_stp_efeed").toString
      val canon = spark.read.parquet(s"$src/customer.parquet")
        .select(col("c_custkey").as("id"), col("c_name").as("s"))
      val recs = canon.limit(1500)
        .select(col("id"), expr("concat(substr(s, 1, 5), substr(s, 7))").as("s"))
      (1 to triggers).foreach { i =>
        recs.select((col("id") + lit(i * 10000000L)).as("id"), col("s"))
          .coalesce(1).write.parquet(s"$feed/b$i")
      }
      val q = Pipelines.runStreamingEntityRes(
        fileStream(feed, "id LONG, s STRING"), canon, out, ckpt)
      q.awaitTermination()
      report("entity_res", q)
      Seq(out, ckpt, feed).foreach(graft.util.Fs.deleteRecursively)
    }

    graft.util.Fs.deleteRecursively(dst)
    spark.stop()
  }
}
