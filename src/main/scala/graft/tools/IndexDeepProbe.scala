package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-factor probe for the INDEX/SERVING families the 100 TB story
  * rests on (round-12 verdict #5) — the DeepProbe pattern extended
  * past the curation flagships:
  *
  *  - **AnnIndex build** — IVF fit + cell-partitioned commit
  *    (corpus-sized, the nightly job);
  *  - **AnnIndex refresh** — incremental MERGE of a CONSTANT-size new
  *    batch (the x1 embeddings re-keyed): must be batch-bound, not
  *    corpus-bound;
  *  - **AnnIndex probed serve** — one top-10 query from the committed
  *    snapshot: must stay ~flat (cell-bounded, own+nprobe);
  *  - **knn_join_ivf** — the fit-regime IVF knn join over the
  *    inflated embeddings;
  *  - **dedup_incremental** — snapshot build is amortized out (it is
  *    `advanceIncrSnapshot`'s job); the probed cost is the per-batch
  *    band-probe + verify, whose batch is corpus/5 BY CONSTRUCTION —
  *    the reading is linearity, with the x100 ratio 4.02 flagged
  *    round-12 either confirmed batch-proportional or convicted.
  *
  * Usage: runMain graft.tools.IndexDeepProbe [factor...]
  *        (default: 30 100 300)
  */
object IndexDeepProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(30, 100, 300) else args.toSeq.map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-index-deep-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val results =
      scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
    val labels = scala.collection.mutable.LinkedHashSet.empty[String]

    def timed(label: String, factor: Int)(thunk: => Unit): Unit = {
      labels += label
      val (err, m) = graft.engine.Metrics.measure(spark)(
        try { thunk; None }
        catch { case t: Throwable =>
          System.err.println(s"== x$factor $label FAILED: ${t.toString.take(300)}")
          Some(t) })
      if (err.isEmpty) {
        results((label, factor)) = m.wallMs / 1e3
        println(f"== x$factor $label%-24s ${m.wallMs / 1e3}%8.1f s   " +
          f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, " +
          f"spill ${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576}%d MB, " +
          f"tasks ${m.tasks}%d, spread ${m.taskSpread}%.1f]")
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // untimed base-scale warmup (the DeepProbe lesson: codegen +
    // reader init otherwise charge the FIRST factor only)
    locally {
      val w = Files.createTempDirectory("graft_idx_warm").toString
      graft.engine.AnnIndex.build(spark,
        spark.read.parquet(s"$src/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e")), w)
      graft.util.Fs.deleteRecursively(w)
      graft.ops.Llm.invalidateAnnIndexCache()
      graft.ops.Llm.invalidateCellCache()
      try graft.util.Exec.drain(
        graft.SparkEntry.queries("q_llm_knn_join_ivf")(spark, src))
      catch { case _: Throwable => () }
      graft.ops.Llm.invalidateSnapshotSigCache()
      try graft.util.Exec.drain(
        graft.SparkEntry.queries("q_llm_dedup_incremental")(spark, src))
      catch { case _: Throwable => () }
    }

    for (factor <- factors) {
      val dst = Files.createTempDirectory(s"graft_idx_x$factor").toString
      println(s"== inflating documents+embeddings x$factor -> $dst")
      val t0 = System.nanoTime()
      Inflate.documentsOnly(spark, src, dst, factor)
      Inflate.embeddingsOnly(spark, src, dst, factor)
      println(f"== inflate took ${(System.nanoTime() - t0) / 1e9}%.1f s")

      val emb = spark.read.parquet(s"$dst/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val idxDir = Files.createTempDirectory(s"graft_idx_tbl_x$factor").toString
      timed("ann index build", factor) {
        graft.engine.AnnIndex.build(spark, emb, idxDir)
      }
      // CONSTANT-size refresh batch: the x1 embeddings re-keyed past
      // every inflated id — refresh cost must track THIS, not the corpus
      val batch = spark.read.parquet(s"$src/embeddings.parquet")
        .select((col("vec_id") + lit(factor.toLong * 10000000L)).as("vec_id"),
          col("embedding").cast("array<double>").as("e"))
      timed("ann index refresh", factor) {
        graft.engine.AnnIndex.refresh(spark, batch, idxDir)
      }
      // the DELTA admission path with the same constant-size batch
      // (re-keyed again): must read flat across factors — its cost is
      // O(batch + unfolded delta), never O(corpus)
      val batch2 = spark.read.parquet(s"$src/embeddings.parquet")
        .select((col("vec_id") + lit((factor + 1).toLong * 10000000L))
          .as("vec_id"), col("embedding").cast("array<double>").as("e"))
      timed("ann refresh delta", factor) {
        graft.engine.AnnIndex.refreshDelta(spark, batch2, idxDir)
      }
      val qe = spark.read.parquet(s"$dst/embeddings.parquet")
        .filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getAs[scala.collection.Seq[Double]](0).toSeq
      timed("ann serve (delta overlay)", factor) {
        graft.util.Exec.drain(
          graft.engine.AnnIndex.query(spark, idxDir, qe, k = 10,
            excludeVecId = Some(0L)))
      }
      // the maintenance fold: one corpus-keyed merge per WINDOW
      // (amortizing the per-trigger merges the full-merge row prices)
      timed("ann fold delta", factor) {
        graft.engine.AnnIndex.foldDelta(spark, idxDir)
      }
      // labeled post-fold deliberately: the delta table EXISTS here
      // (drained by the fold above), so this row prices the
      // steady-state production serve — overlay machinery present,
      // delta near-empty — not the pristine pre-delta snapshot path
      // (which the pre-refresh rows of earlier rounds measured)
      timed("ann probed serve (post-fold)", factor) {
        graft.util.Exec.drain(
          graft.engine.AnnIndex.query(spark, idxDir, qe, k = 10,
            excludeVecId = Some(0L)))
      }
      graft.ops.Llm.invalidateAnnIndexCache()
      graft.ops.Llm.invalidateCellCache()
      timed("knn join ivf (fit)", factor) {
        graft.util.Exec.drain(
          graft.SparkEntry.queries("q_llm_knn_join_ivf")(spark, dst))
      }
      // amortize the snapshot build out of the probed row: the
      // incremental operator's recurring cost is the batch probe, the
      // snapshot is advanceIncrSnapshot's nightly job
      graft.ops.Llm.invalidateSnapshotSigCache()
      try graft.util.Exec.drain(
        graft.SparkEntry.queries("q_llm_dedup_incremental")(spark, dst))
      catch { case t: Throwable =>
        System.err.println(s"== x$factor incr snapshot build FAILED: $t") }
      timed("dedup incr (batch probe)", factor) {
        graft.util.Exec.drain(
          graft.SparkEntry.queries("q_llm_dedup_incremental")(spark, dst))
      }
      // CONSTANT-size batch (the x1 documents re-keyed) against the
      // x-scaled snapshot: the fixture entry's batch is corpus/5 BY
      // CONSTRUCTION, so its row cannot separate batch growth from
      // corpus coupling — this row can. Under the broadcast cap the
      // corpus-sized snapshot streams map-side through a
      // broadcast-hash band join (shuffleW must read ~0) and the row
      // must stay flat across factors.
      val constBatch = spark.read.parquet(s"$src/documents.parquet")
        .select((col("doc_id") + lit((factor + 7).toLong * 1000000000L))
          .as("doc_id"), col("text"))
      timed("dedup incr (const batch)", factor) {
        graft.util.Exec.drain(
          graft.ops.Llm.dedupIncrementalBatch(spark, dst, constBatch))
      }
      graft.ops.Llm.invalidateSnapshotSigCache()
      graft.util.Fs.deleteRecursively(idxDir)
      graft.util.Fs.deleteRecursively(dst)
    }

    println("\n== index-family deep trend (seconds)")
    for (label <- labels) {
      val cells = factors.map(f =>
        results.get((label, f)).map(s => f"x$f%-5d ${s}%8.1f s")
          .getOrElse(f"x$f%-5d   FAILED"))
      println(f"== $label%-24s ${cells.mkString("  ")}")
    }
    spark.stop()
  }
}
