package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.engine.{AnnIndex, ConcurrentCommitException, VersionedTable}

/** Long-running-stream TABLE MAINTENANCE soak — the round-7 gap: both
  * the ANN cells table and the incremental-dedup signature snapshot
  * grow a version per micro-batch, and `compact`/`expireVersions`
  * existed but nothing exercised a live stream racing a retention
  * loop (the VersionedTableStressSpec soaks batch writers only).
  *
  * Contract under race: maintenance may LOSE commit claims to the
  * stream (a tolerated conflict, as in the stress spec) but must
  * never corrupt it — probes stay answer-stable through every
  * trigger, the dedup gate stays exact (no re-admitted duplicate, no
  * lost admission), and the version history stays consistent (every
  * listed version readable, pointer = max). */
class RetentionSoakSpec extends SparkTestBase {
  import spark.implicits._

  /** Retention loop racing the stream; tolerated failures are commit
    * conflicts only. Returns (stopFlag, thread, unexpectedFailures). */
  private def maintenanceLoop(dir: String, keepLast: Int)
      : (java.util.concurrent.atomic.AtomicBoolean, Thread,
        ConcurrentLinkedQueue[Throwable]) = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val t = new Thread(() => {
      while (!stop.get()) {
        try {
          try VersionedTable.compact(spark, dir, targetFiles = 2)
          catch { case _: ConcurrentCommitException => () } // lost the claim
          VersionedTable.expireVersions(spark, dir, keepLast)
        } catch {
          case _: ConcurrentCommitException => ()
          case e: Throwable => failures.add(e)
        }
        Thread.sleep(100L)
      }
    }, s"retention-soak-${new java.io.File(dir).getName}")
    t.start()
    (stop, t, failures)
  }

  private def checkHistoryConsistent(dir: String): Unit = {
    val vs = VersionedTable.versions(spark, dir)
    assert(vs.nonEmpty && vs == vs.sorted, s"versions must list sorted: $vs")
    val cur = VersionedTable.currentVersion(spark, dir).get
    assert(vs.max == cur, s"pointer $cur must be the newest listed of $vs")
    // every retained version is readable (no dangling summary entry)
    vs.foreach(v => VersionedTable.read(spark, dir, Some(v)).count())
  }

  test("streaming ANN refresh races compact+expire: probes answer-stable, history consistent") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 40).map(i => (i.toLong, vec(100 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val dir = java.nio.file.Files.createTempDirectory("graft_soak_ann").toString
    val src = java.nio.file.Files.createTempDirectory("graft_soak_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak_ck").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    val cells = AnnIndex.cellsDir(dir)
    val (stop, thread, failures) = maintenanceLoop(cells, keepLast = 4)
    val triggers = 6
    val trigMetrics = scala.collection.mutable.ArrayBuffer.empty[TriggerMetrics]
    try {
      (1 to triggers).foreach { i =>
        // each trigger lands one new (far-from-anchor) vector
        Seq((1000L + i, vec(5000 + i))).toDF("vec_id", "e")
          .write.parquet(s"$src/b$i")
        val q = Pipelines.runStreamingAnnRefresh(
          spark.readStream.schema("vec_id LONG, e ARRAY<DOUBLE>")
            .option("recursiveFileLookup", "true").parquet(src),
          dir, ckpt)
        q.awaitTermination()
        trigMetrics ++= StreamMetrics.perTrigger(q)
        // answer-stability through every trigger + retention cycle
        val top = AnnIndex.query(spark, dir, anchor, k = 1)
          .as[(Long, Int, Double)].collect().head
        assert(top._1 == 900L && top._3 > 0.999,
          s"trigger $i: probe must stay answer-stable, got $top")
      }
    } finally { stop.set(true); thread.join(30000) }
    assert(failures.isEmpty, "maintenance loop surfaced failures: " +
      failures.asScala.take(3).map(_.toString).mkString("; "))
    // per-trigger observability for the refresh face, under the race:
    // one duration-carrying progress row per trigger, each ingesting
    // exactly its own 1-vector batch (offset tracking, no re-reads)
    assert(trigMetrics.size == triggers &&
      trigMetrics.forall(m => m.inputRows == 1 && m.durationMs > 0),
      s"refresh soak metrics: ${StreamMetrics.pretty(trigMetrics.toSeq)}")
    checkHistoryConsistent(cells)
    // every streamed vector survived the retention races
    val ids = VersionedTable.read(spark, cells)
      .select($"vec_id").as[Long].collect().toSet
    (1 to triggers).foreach(i => assert(ids.contains(1000L + i),
      s"streamed vector ${1000 + i} lost under the retention race"))
    Seq(dir, src, ckpt).foreach(graft.util.Fs.deleteRecursively)
  }

  test("streaming ANN + PQ sync race full-index expire: both serve paths stable, lineage coherent") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 40).map(i => (i.toLong, vec(100 + i)))
    val dir = java.nio.file.Files.createTempDirectory("graft_soakpq_idx").toString
    val src = java.nio.file.Files.createTempDirectory("graft_soakpq_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soakpq_ck").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    AnnIndex.buildPq(spark, dir)
    // maintenance here is the FULL index retention (AnnIndex.expire:
    // cells + centroids + codes + codebook, lineage-floored), not the
    // raw single-table loop of the previous soak
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val thread = new Thread(() => {
      while (!stop.get()) {
        try {
          try VersionedTable.compact(spark, AnnIndex.cellsDir(dir),
            targetFiles = 4)
          catch { case _: ConcurrentCommitException => () }
          AnnIndex.expire(spark, dir, keepLast = 3)
        } catch {
          case _: ConcurrentCommitException => ()
          case e: Throwable => failures.add(e)
        }
        Thread.sleep(20L)
      }
    }, "retention-soak-annpq")
    thread.start()
    val triggers = 6
    try {
      (1 to triggers).foreach { r =>
        // each trigger lands one vector; trigger 4's IS the anchor,
        // so every later probe has a known exact answer
        val v = if (r == 4) anchor else vec(7000 + r)
        Seq((800L + r, v)).toDF("vec_id", "e").write.parquet(s"$src/b$r")
        Pipelines.runStreamingAnnRefresh(
          spark.readStream.schema("vec_id LONG, e ARRAY<DOUBLE>")
            .option("recursiveFileLookup", "true").parquet(src),
          dir, ckpt).awaitTermination()
        AnnIndex.syncCodes(spark, dir)
        // BOTH serve paths answer mid-soak, racing the maintenance
        val top = AnnIndex.query(spark, dir, anchor, k = 1)
          .as[(Long, Int, Double)].collect().head
        val topPq = AnnIndex.queryPq(spark, dir, anchor, k = 1)
          .as[(Long, Int, Double)].collect().head
        if (r >= 4) {
          assert(top._1 == 804L && top._3 > 0.999999,
            s"trigger $r: float probe lost the landed anchor: $top")
          assert(topPq._1 == 804L,
            s"trigger $r: PQ probe lost the landed anchor: $topPq")
        } else
          // the PQ shortlist covers the whole probed set at this
          // size, so the two paths must agree verbatim even on noise
          assert(topPq == top,
            s"trigger $r: serve paths diverged: float $top pq $topPq")
      }
    } finally { stop.set(true); thread.join(30000) }
    assert(failures.isEmpty, "maintenance loop surfaced failures: " +
      failures.asScala.take(3).map(_.toString).mkString("; "))
    checkHistoryConsistent(AnnIndex.cellsDir(dir))
    checkHistoryConsistent(AnnIndex.pqCodesDir(dir))
    val ids = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .select($"vec_id").as[Long].collect().toSet
    (1 to triggers).foreach(r => assert(ids.contains(800L + r),
      s"streamed vector ${800 + r} lost under the retention race"))
    // a final quiesced retention pass: codes history lands exactly at
    // keepLast; cells shrinks to the newest keepLast plus at most one
    // pinned snapshot per retained codes version (each sync pinned
    // its round's cells version; the floor honors every retained pin
    // and releases it when the codes version expires).
    // Capture each soon-to-be-retained version's pinned ANSWER first:
    // cross-wired lineage (old codes scored with a new codebook, or
    // re-ranked against the wrong cells snapshot) still returns
    // nonEmpty garbage — only answer equality catches it
    val willRetain = VersionedTable
      .versions(spark, AnnIndex.pqCodesDir(dir)).takeRight(3)
    val pinnedBefore = willRetain.map(cv => cv ->
      AnnIndex.queryPq(spark, dir, anchor, k = 1, version = Some(cv))
        .as[(Long, Int, Double)].collect().toSeq).toMap
    AnnIndex.expire(spark, dir, keepLast = 3)
    val codesAfter = VersionedTable.versions(spark, AnnIndex.pqCodesDir(dir))
    val cellsAfter = VersionedTable.versions(spark, AnnIndex.cellsDir(dir))
    assert(codesAfter.size == 3, s"codes history must land at keepLast: $codesAfter")
    assert(cellsAfter.size <= 3 + codesAfter.size,
      s"cells retention must land at the bounded steady state: $cellsAfter")
    // every retained codes version still serves PINNED, and serves
    // the SAME answer it served before retention
    codesAfter.foreach { cv =>
      val after = AnnIndex
        .queryPq(spark, dir, anchor, k = 1, version = Some(cv))
        .as[(Long, Int, Double)].collect().toSeq
      assert(after == pinnedBefore(cv),
        s"retained codes v$cv answer drifted across expire: " +
          s"${pinnedBefore(cv)} -> $after")
    }
    assert(AnnIndex.queryPq(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 804L,
      "post-retention PQ serve must still answer")
    Seq(dir, src, ckpt).foreach(graft.util.Fs.deleteRecursively)
  }

  test("streaming DELTA refresh races fold+compact+expire: every vector " +
      "servable at every instant, seq floor never reused") {
    // the round-13 verdict's missing soak: refreshDelta/foldDelta/
    // overlay-serve have race SPECS (seq-floor, vanished-delta) but the
    // full-merge face got an N-trigger soak and the delta face did not
    // — and the seq-HWM machinery is exactly the kind of code soaks
    // convict. Two racing maintenance threads: the standard
    // compact+expire loop on the cells table, plus a FOLD loop draining
    // the delta mid-stream. Per-trigger asserts: the anchor probe stays
    // answer-stable AND the vector streamed THIS trigger is already
    // servable (overlay or folded — reachability at every instant is
    // the machinery's core claim).
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 40).map(i => (i.toLong, vec(100 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val dir = java.nio.file.Files.createTempDirectory("graft_soakd_idx").toString
    val src = java.nio.file.Files.createTempDirectory("graft_soakd_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soakd_ck").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    val cells = AnnIndex.cellsDir(dir)
    val (stop, thread, failures) = maintenanceLoop(cells, keepLast = 4)
    val foldStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val foldFailures = new ConcurrentLinkedQueue[Throwable]()
    val folder = new Thread(() => {
      while (!foldStop.get()) {
        try AnnIndex.foldDelta(spark, dir)
        catch {
          case _: ConcurrentCommitException => () // lost the claim
          case e: Throwable => foldFailures.add(e)
        }
        Thread.sleep(80L)
      }
    }, "retention-soak-delta-fold")
    folder.start()
    val triggers = 6
    val trigMetrics = scala.collection.mutable.ArrayBuffer.empty[TriggerMetrics]
    try {
      (1 to triggers).foreach { i =>
        val nv = vec(5000 + i)
        Seq((1000L + i, nv)).toDF("vec_id", "e")
          .write.parquet(s"$src/b$i")
        val q = Pipelines.runStreamingAnnRefresh(
          spark.readStream.schema("vec_id LONG, e ARRAY<DOUBLE>")
            .option("recursiveFileLookup", "true").parquet(src),
          dir, ckpt, delta = true)
        q.awaitTermination()
        trigMetrics ++= StreamMetrics.perTrigger(q)
        // the anchor's answer is stable through every trigger + fold +
        // retention cycle...
        val top = AnnIndex.query(spark, dir, anchor, k = 1)
          .as[(Long, Int, Double)].collect().head
        assert(top._1 == 900L && top._3 > 0.999,
          s"trigger $i: probe must stay answer-stable, got $top")
        // ...and the vector admitted THIS trigger is immediately
        // servable, whether it is still in the delta overlay, mid-fold,
        // or already folded — no unreachable instant
        val self = AnnIndex.query(spark, dir, nv, k = 1)
          .as[(Long, Int, Double)].collect().head
        assert(self._1 == 1000L + i && self._3 > 0.999,
          s"trigger $i: freshly admitted vector must serve, got $self")
      }
    } finally {
      stop.set(true); foldStop.set(true)
      thread.join(30000); folder.join(30000)
    }
    assert(failures.isEmpty, "maintenance loop surfaced failures: " +
      failures.asScala.take(3).map(_.toString).mkString("; "))
    assert(foldFailures.isEmpty, "fold loop surfaced failures: " +
      foldFailures.asScala.take(3).map(_.toString).mkString("; "))
    assert(trigMetrics.size == triggers &&
      trigMetrics.forall(m => m.inputRows == 1 && m.durationMs > 0),
      s"delta soak metrics: ${StreamMetrics.pretty(trigMetrics.toSeq)}")
    checkHistoryConsistent(cells)
    // a final deterministic fold drains whatever the racing folds left;
    // afterwards every streamed vector must be IN THE CELLS TABLE with
    // no surviving delta row (nothing lost to a seq-floor reuse, no
    // zombie overlay row serving a stale value)
    AnnIndex.foldDelta(spark, dir)
    val folded = VersionedTable.read(spark, cells)
      .select($"vec_id").as[Long].collect().toSet
    (1 to triggers).foreach(i => assert(folded.contains(1000L + i),
      s"streamed vector ${1000 + i} lost across the fold races"))
    val deltaLeft = VersionedTable.currentVersion(spark,
        AnnIndex.deltaDir(dir))
      .map(v => VersionedTable.read(spark, AnnIndex.deltaDir(dir), Some(v))
        .count()).getOrElse(0L)
    assert(deltaLeft == 0L,
      s"final fold must drain the delta, $deltaLeft rows left")
    Seq(dir, src, ckpt).foreach(graft.util.Fs.deleteRecursively)
  }

  test("streaming incr dedup races compact+expire: gate stays exact across triggers") {
    val snap = java.nio.file.Files.createTempDirectory("graft_soak_snap").toString
    val out = java.nio.file.Files.createTempDirectory("graft_soak_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak_ck2").toString
    val src = java.nio.file.Files.createTempDirectory("graft_soak_dsrc").toString
    // genuinely distinct shingle sets per doc — the banded gate
    // catches NEAR-duplicates, so sentence templates differing in one
    // token would (correctly) collide
    def text(i: Int): String = {
      val r = new scala.util.Random(42 + i)
      (0 until 12).map(_ => "w" + r.nextInt(1000000)).mkString(" ")
    }
    // seed the snapshot so maintenance always has a committed version
    VersionedTable.commit(
      graft.ops.Llm.mapOnlyBandedSignatures(graft.ops.Llm.shingleDocs(
        Seq((0L, text(0))).toDF("doc_id", "text"))), snap)
    val (stop, thread, failures) = maintenanceLoop(snap, keepLast = 3)
    val triggers = 5
    val trigMetrics = scala.collection.mutable.ArrayBuffer.empty[TriggerMetrics]
    try {
      (1 to triggers).foreach { i =>
        // one novel doc + one exact duplicate of an EARLIER admission
        // (batch i duplicates batch i-1's novel doc; batch 1
        // duplicates the seed)
        Seq((100L + i, text(i)), (200L + i, text(i - 1)))
          .toDF("doc_id", "text")
          .write.parquet(s"$src/b$i")
        val q = Pipelines.runStreamingIncrDedup(
          spark.readStream.schema("doc_id LONG, text STRING")
            .option("recursiveFileLookup", "true").parquet(src),
          snap, out, ckpt)
        q.awaitTermination()
        trigMetrics ++= StreamMetrics.perTrigger(q)
        val admitted = spark.read.parquet(out)
          .select($"doc_id").as[Long].collect().toSet
        val expected = (1 to i).map(100L + _).toSet
        assert(admitted == expected,
          s"trigger $i: gate must admit exactly the novel docs; " +
            s"got $admitted expected $expected")
      }
    } finally { stop.set(true); thread.join(30000) }
    // per-trigger observability under the soak: every trigger reported
    // its batch duration and exactly its own batch's input (offset
    // tracking — never a re-read of the accumulated source); the gate
    // is foreachBatch-faced, so keyed-operator state is 0 by design
    // and the versioned signature snapshot (asserted below) is its
    // durable state metric
    assert(trigMetrics.size == triggers,
      s"one progress row per data trigger: ${StreamMetrics.pretty(trigMetrics.toSeq)}")
    assert(trigMetrics.forall(_.inputRows == 2),
      s"each trigger ingests exactly its 2-doc batch: ${StreamMetrics.pretty(trigMetrics.toSeq)}")
    assert(trigMetrics.forall(_.durationMs > 0),
      s"batch durations must be recorded: ${StreamMetrics.pretty(trigMetrics.toSeq)}")
    assert(failures.isEmpty, "maintenance loop surfaced failures: " +
      failures.asScala.take(3).map(_.toString).mkString("; "))
    checkHistoryConsistent(snap)
    // the signature snapshot still carries every admitted doc's
    // signatures (compaction is content-preserving)
    val sigDocs = VersionedTable.read(spark, snap)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert((1 to triggers).forall(i => sigDocs.contains(100L + i)),
      s"signatures lost under retention race: $sigDocs")
    Seq(snap, out, ckpt, src).foreach(graft.util.Fs.deleteRecursively)
  }
}
