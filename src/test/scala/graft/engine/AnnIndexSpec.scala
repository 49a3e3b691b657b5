package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.Llm

/** The persisted-index contract: probing the committed snapshot must
  * reproduce the per-session fit (`annIvf`), a refresh must admit new
  * vectors through the race-safe merge WITHOUT refitting, and time
  * travel must serve yesterday's index unchanged. */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("probe-from-snapshot equals probe-from-fit (q_llm_ann_ivf)") {
    // the explicit fit regime (the entry itself dispatches to a
    // committed index when one exists — asserting through the entry
    // would compare snapshot with snapshot once the index is built)
    val fromFit = Llm.annIvfFit(spark, sfSmoke)
      .as[(Long, Int, Double)].collect().toSeq
    val fromSnapshot = Llm.queries("q_llm_ann_index")(spark, sfSmoke)
      .as[(Long, Int, Double)].collect().toSeq
    // a shared regression returning zero rows from BOTH paths would
    // satisfy bare equality — anchor the contract on real output
    assert(fromFit.nonEmpty, "fit probe must return neighbors")
    assert(fromSnapshot == fromFit,
      s"snapshot probe diverged:\nfit  $fromFit\nsnap $fromSnapshot")
    // the session is shared across suites (getOrCreate) — leaving the
    // committed index would silently flip other suites' annIvf calls
    // into the dispatch regime
    Llm.invalidateAnnIndexCache()
  }

  test("committed-index dispatch: annIvf and the kNN serve never reach the fit path") {
    // expectations computed on the FIT regime first (these populate
    // the cell memo, which is then cleared so the dispatch assertion
    // below can prove the fit never re-ran)
    val wantIvf = Llm.annIvfFit(spark, sfSmoke)
      .as[(Long, Int, Double)].collect().toSeq
    val wantKnn = Llm.knnJoinIvf(spark, sfSmoke, 10)
      .as[(Long, Long, Double, Int)].collect().toSeq
    // commit the index for this dir (idempotent if an earlier test
    // already did), then drop every memoized fit
    Llm.queries("q_llm_ann_index")(spark, sfSmoke).collect()
    Llm.invalidateCellCache()
    val gotIvf = Llm.queries("q_llm_ann_ivf")(spark, sfSmoke)
      .as[(Long, Int, Double)].collect().toSeq
    assert(gotIvf == wantIvf,
      s"dispatch changed the answer:\nfit  $wantIvf\ndisp $gotIvf")
    val gotKnn = Llm.queries("q_llm_knn_join_ivf")(spark, sfSmoke)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(gotKnn == wantKnn,
      s"kNN dispatch changed the answer:\nfit  $wantKnn\ndisp $gotKnn")
    // the regime proof: result equality alone cannot distinguish the
    // paths (they are pinned identical by design) — the fit memo must
    // still be EMPTY for this dir after both dispatched serves
    assert(!Llm.cellCacheContains(spark, sfSmoke),
      "dispatch fell through to the in-session quantizer fit")
    // restore the no-index regime for later suites sharing the session
    Llm.invalidateAnnIndexCache()
  }

  test("refresh admits new vectors incrementally; time travel serves the old index") {
    val dim = 8
    // anchor + spread-out noise vectors: the anchor's neighbors are
    // unambiguous, so probe results are deterministic
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    def nearAnchor(seed: Int, eps: Double): Seq[Double] = {
      val r = new scala.util.Random(seed)
      anchor.map(x => x + eps * r.nextGaussian())
    }
    val base = (0 until 40).map(i => (i.toLong, vec(100 + i))) :+
      (900L, nearAnchor(2, 0.01))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_idx").toString
    val v0 = AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)

    val before = AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq
    assert(before.head._1 == 900L && before.head._3 > 0.999,
      s"planted near-anchor must rank first: $before")

    // refresh: one NEW vector even closer to the anchor, plus a
    // RE-INGEST of 900 moved far away (matched-update path)
    val news = Seq(
      (901L, nearAnchor(3, 0.001)),
      (900L, vec(999))).toDF("vec_id", "e")
    val v1 = AnnIndex.refresh(spark, news, dir)
    assert(v1 == v0 + 1)

    val after = AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq
    assert(after.head._1 == 901L && after.head._3 > 0.999,
      s"refreshed vector must be servable: $after")
    assert(!after.exists(r => r._1 == 900L && r._3 > 0.999),
      s"re-ingested 900 must carry its NEW position: $after")

    // time travel: the pre-refresh snapshot still answers as before
    val old = AnnIndex.query(spark, dir, anchor, k = 3, version = Some(v0))
      .as[(Long, Int, Double)].collect().toSeq
    assert(old == before, s"time travel must serve v$v0 unchanged: $old")

    // refresh assignment rule == the documented MLlib rule, asserted
    // DIRECTLY on the cells refresh wrote (a rebuild-and-compare-maps
    // form only checked key presence — trivially true — and left the
    // not-matched-INSERT assignment path with zero real coverage):
    // argmin squared euclid of the UNIT vector over the committed
    // centroids, first cell id wins ties.
    val merged = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    val cents = VersionedTable.read(spark, AnnIndex.centroidsDir(dir))
      .select(col("cell"), col("ce")).as[(Int, Seq[Double])]
      .collect().sortBy(_._1)
    def expectCell(v: Seq[Double]): Int = {
      val n = math.sqrt(v.map(x => x * x).sum)
      val u = v.map(_ / n)
      cents.minBy { case (i, c) =>
        (c.zip(u).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }._1
    }
    assert(merged(901L) == expectCell(nearAnchor(3, 0.001)),
      "inserted vector must land in its MLlib-rule cell")
    assert(merged(900L) == expectCell(vec(999)),
      "re-ingested vector must land in its NEW position's cell")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("delta refresh: batch-bound admission is immediately probeable, folds exactly, and respects remove/rebuild") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    def nearAnchor(seed: Int, eps: Double): Seq[Double] = {
      val r = new scala.util.Random(seed)
      anchor.map(x => x + eps * r.nextGaussian())
    }
    val base = (0 until 40).map(i => (i.toLong, vec(100 + i))) :+
      (900L, nearAnchor(2, 0.01))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_dlt").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)

    // delta batch 1: a new top neighbor AND a latest-wins re-ingest of
    // 900 (whose CELLS row must stop serving without any cells commit)
    val d0 = AnnIndex.refreshDelta(spark,
      Seq((901L, nearAnchor(3, 0.001)), (900L, vec(999)))
        .toDF("vec_id", "e"), dir)
    assert(d0 == 0L)
    val after = AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq
    assert(after.head._1 == 901L && after.head._3 > 0.999,
      s"delta-admitted vector must serve immediately: $after")
    assert(!after.exists(r => r._1 == 900L && r._3 > 0.999),
      s"re-ingested 900's superseded cells row must stop serving: $after")

    // delta batch 2, then fold ONLY batch 1: served results must not
    // change, and the delta must retain EXACTLY the unfolded batch
    val d1 = AnnIndex.refreshDelta(spark,
      Seq((902L, nearAnchor(4, 5e-4))).toDF("vec_id", "e"), dir)
    assert(d1 == 1L)
    val full = AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq
    // 901 and 902 both round to cosine 1.0 at 6 decimals — order
    // within the pair is the deterministic vec_id tiebreak, so assert
    // membership, not order
    assert(full.map(_._1).take(2).toSet == Set(901L, 902L),
      s"both batches serve: $full")
    AnnIndex.foldDelta(spark, dir, upTo = Some(d0))
    assert(AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq == full,
      "partial fold must not change served results")
    val left = VersionedTable.read(spark, AnnIndex.deltaDir(dir))
      .select(col("vec_id"), col("seq")).as[(Long, Long)].collect().toSet
    assert(left == Set((902L, 1L)),
      s"fold must truncate exactly the folded (vec_id, seq) rows: $left")
    // 900's fold went through the MATCHED-UPDATE path: its cells row
    // now carries the re-ingested position
    val cells = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .filter(col("vec_id") === 900L).select(col("e"))
      .as[Seq[Double]].head()
    assert(cells == vec(999), "folded re-ingest must update the cells row")
    // fold the rest: delta drains, results hold
    AnnIndex.foldDelta(spark, dir)
    assert(VersionedTable.read(spark, AnnIndex.deltaDir(dir)).count() == 0)
    assert(AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq == full,
      "full fold must not change served results")

    // remove() reaches unfolded delta rows
    AnnIndex.refreshDelta(spark,
      Seq((903L, nearAnchor(5, 8e-4))).toDF("vec_id", "e"), dir)
    assert(AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect()
      .exists(r => r._1 == 903L && r._3 > 0.999),
      "delta-admitted 903 must serve before removal")
    AnnIndex.remove(spark, Seq(903L), dir)
    assert(!AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().exists(_._1 == 903L),
      "remove must retire the unfolded delta row too")

    // a REBUILD requantizes: the stale delta is cleared, not overlaid
    AnnIndex.refreshDelta(spark,
      Seq((904L, nearAnchor(6, 2e-3))).toDF("vec_id", "e"), dir)
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    assert(VersionedTable.currentVersion(spark, AnnIndex.deltaDir(dir)).isEmpty,
      "rebuild must clear the unfolded delta")
    assert(!AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().exists(_._1 == 904L),
      "a cleared delta must not overlay the rebuilt index")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("mixed admission faces reconcile: refresh() evicts a vec_id's stale delta row; seq stays monotone across a drained fold") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    def nearAnchor(seed: Int, eps: Double): Seq[Double] = {
      val r = new scala.util.Random(seed)
      anchor.map(x => x + eps * r.nextGaussian())
    }
    val base = (0 until 40).map(i => (i.toLong, vec(400 + i)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_mix").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)

    // X admitted via the DELTA face near the anchor...
    AnnIndex.refreshDelta(spark,
      Seq((950L, nearAnchor(2, 1e-3))).toDF("vec_id", "e"), dir)
    // ...then RE-INGESTED via the FULL-MERGE face far away: the stale
    // delta row must be evicted, or the latest-wins overlay would keep
    // serving the old position and a later fold would overwrite the
    // newer cells value with it
    AnnIndex.refresh(spark, Seq((950L, vec(777))).toDF("vec_id", "e"), dir)
    assert(!AnnIndex.query(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().exists(r => r._1 == 950L && r._3 > 0.999),
      "refresh() must evict the superseded delta row")
    AnnIndex.foldDelta(spark, dir)
    val e950 = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .filter(col("vec_id") === 950L).select(col("e")).as[Seq[Double]].head()
    assert(e950 == vec(777),
      "fold must not resurrect the pre-refresh delta value")

    // seq monotonicity across a DRAINED delta: fold empties the table,
    // and the next admission must NOT reuse seq 0 — a repeated
    // (vec_id, seq) pair would let foldDelta(upTo = <old version>)
    // truncate a never-folded row
    AnnIndex.refreshDelta(spark,
      Seq((951L, nearAnchor(3, 1e-3))).toDF("vec_id", "e"), dir)
    AnnIndex.foldDelta(spark, dir) // drains (951 folded)
    AnnIndex.refreshDelta(spark,
      Seq((951L, nearAnchor(4, 2e-3))).toDF("vec_id", "e"), dir)
    val seqs = VersionedTable.read(spark, AnnIndex.deltaDir(dir))
      .select(col("vec_id"), col("seq")).as[(Long, Long)].collect().toSet
    assert(seqs.forall(_._2 >= 1L),
      s"post-drain admissions must not reuse folded seq values: $seqs")
    // an empty-delta fold is a no-op, not a version churn
    AnnIndex.foldDelta(spark, dir)
    val cellsBefore = VersionedTable.currentVersion(spark, AnnIndex.cellsDir(dir))
    assert(AnnIndex.foldDelta(spark, dir).isEmpty,
      "folding a drained delta must short-circuit")
    assert(VersionedTable.currentVersion(spark, AnnIndex.cellsDir(dir)) == cellsBefore,
      "an empty fold must not commit a cells version")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("fold bumps the seq floor past a dead writer's rows; an expired upTo watermark is an idempotent no-op") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val base = (0 until 20).map(i => (i.toLong, vec(600 + i)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_hwm").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    AnnIndex.refreshDelta(spark,
      Seq((970L, vec(21))).toDF("vec_id", "e"), dir)
    // simulate a writer dying between its merge commit and its own
    // _SEQ_HWM write: the rows landed, the sidecar never did
    val hwmFile = new java.io.File(
      new java.io.File(AnnIndex.deltaDir(dir)), "_SEQ_HWM")
    assert(hwmFile.exists(), "refreshDelta must have written the mark")
    assert(hwmFile.delete())
    val foldedSeq = VersionedTable.read(spark, AnnIndex.deltaDir(dir))
      .agg(org.apache.spark.sql.functions.max(col("seq"))).head().getLong(0)
    AnnIndex.foldDelta(spark, dir) // drains the dead writer's rows
    // the fold must restore the floor the dead writer never recorded —
    // without it the next admission reuses the folded seq and a later
    // watermarked truncation can silently eat never-folded rows
    val restored = new String(java.nio.file.Files.readAllBytes(
      hwmFile.toPath), java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    assert(restored >= foldedSeq,
      s"fold must bump _SEQ_HWM to the folded max: $restored < $foldedSeq")
    AnnIndex.refreshDelta(spark,
      Seq((971L, vec(22))).toDF("vec_id", "e"), dir)
    val seqs = VersionedTable.read(spark, AnnIndex.deltaDir(dir))
      .select(col("seq")).as[Long].collect()
    assert(seqs.forall(_ > foldedSeq),
      s"post-drain admission must not reuse a folded seq: $seqs")

    // expired-watermark retry: fold repeatedly so keepLast=2 expires
    // the old delta history, then retry a fold at the dead watermark —
    // the correct outcome is the idempotent no-op, not a read failure
    val staleWatermark =
      VersionedTable.currentVersion(spark, AnnIndex.deltaDir(dir)).get
    AnnIndex.foldDelta(spark, dir)
    for (i <- 0 until 4) {
      AnnIndex.refreshDelta(spark,
        Seq((980L + i, vec(30 + i))).toDF("vec_id", "e"), dir)
      AnnIndex.foldDelta(spark, dir)
    }
    assert(AnnIndex.foldDelta(spark, dir, upTo = Some(staleWatermark)).isEmpty,
      "a watermark older than the retained delta history is already folded")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("queryPq overlays the unfolded delta with exact scoring; fold syncs codes before truncating") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    def nearAnchor(seed: Int, eps: Double): Seq[Double] = {
      val r = new scala.util.Random(seed)
      anchor.map(x => x + eps * r.nextGaussian())
    }
    val base = (0 until 40).map(i => (i.toLong, vec(300 + i))) :+
      (900L, nearAnchor(2, 0.01))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pqd").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    AnnIndex.buildPq(spark, dir)
    val pq0 = AnnIndex.queryPq(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq
    assert(pq0.head._1 == 900L, s"baseline PQ probe: $pq0")

    // delta: a closer vector (no codes exist for it — exact overlay)
    // and a re-ingest of 900 far away (its CODED row must drop)
    AnnIndex.refreshDelta(spark,
      Seq((905L, nearAnchor(7, 1e-3)), (900L, vec(998)))
        .toDF("vec_id", "e"), dir)
    val pqAfter = AnnIndex.queryPq(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq
    assert(pqAfter.head._1 == 905L && pqAfter.head._3 > 0.999,
      s"uncoded delta vector must serve via exact overlay: $pqAfter")
    assert(!pqAfter.exists(r => r._1 == 900L && r._3 > 0.999),
      s"superseded coded row must stop serving: $pqAfter")

    // fold: codes sync INSIDE the fold, so the folded vector stays
    // servable through PQ with an EMPTY delta
    AnnIndex.foldDelta(spark, dir)
    assert(VersionedTable.read(spark, AnnIndex.deltaDir(dir)).count() == 0)
    val pqFolded = AnnIndex.queryPq(spark, dir, anchor, k = 3)
      .as[(Long, Int, Double)].collect().toSeq
    assert(pqFolded == pqAfter,
      s"fold+sync must preserve PQ results:\npre  $pqAfter\npost $pqFolded")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("streaming refresh trails the vector stream; replay bumps nothing") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 40).map(i => (i.toLong, vec(200 + i)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_str").toString
    val src = java.nio.file.Files.createTempDirectory("graft_ann_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ann_ck").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    // batch 1: a near-anchor vector lands through the stream
    Seq((800L, anchor.map(_ + 0.001))).toDF("vec_id", "e")
      .write.parquet(s"$src/b1")
    def run(): Unit =
      graft.streaming.Pipelines.runStreamingAnnRefresh(
        spark.readStream.schema("vec_id LONG, e ARRAY<DOUBLE>")
          .option("recursiveFileLookup", "true").parquet(src),
        dir, ckpt).awaitTermination()
    run()
    val top = AnnIndex.query(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head
    assert(top._1 == 800L && top._3 > 0.999,
      s"streamed vector must be servable: $top")
    val vAfter = VersionedTable.currentVersion(spark, AnnIndex.cellsDir(dir))
    // replay: a fresh run over the same files (new checkpoint, same
    // writer marker semantics) must not re-merge the landed epoch
    graft.util.Fs.deleteRecursively(ckpt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(ckpt))
    run()
    // new lineage, marker is writer-scoped: version MAY bump once but
    // the index content must be unchanged (value idempotence)
    val again = AnnIndex.query(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head
    assert(again == top, s"replayed refresh must not change answers: $again")
    // same-lineage replay: the epoch marker short-circuits entirely
    val vNow = VersionedTable.currentVersion(spark, AnnIndex.cellsDir(dir))
    graft.streaming.Pipelines.annRefreshBatch(
      Seq((800L, anchor.map(_ + 0.001))).toDF("vec_id", "e"), 0L, dir,
      graft.streaming.Pipelines.writerToken(spark, ckpt))
    assert(VersionedTable.currentVersion(spark, AnnIndex.cellsDir(dir)) == vNow,
      "an already-landed epoch must not commit a new version")
    // version growth across the new-lineage replay is bounded: the
    // fresh writer token may re-land the epoch ONCE (value-idempotent,
    // asserted above), never more (a bare nonEmpty here constrained
    // nothing — currentVersion after a successful build is always
    // defined)
    assert(vNow.get - vAfter.get <= 1,
      s"new-lineage replay must bump at most once: $vAfter -> $vNow")
    Seq(dir, src, ckpt).foreach(graft.util.Fs.deleteRecursively)
  }

  test("remove retires vectors: never probed, survives refresh, time travel intact") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    def nearAnchor(seed: Int, eps: Double): Seq[Double] = {
      val r = new scala.util.Random(seed)
      anchor.map(x => x + eps * r.nextGaussian())
    }
    val base = (0 until 40).map(i => (i.toLong, vec(700 + i))) :+
      (900L, nearAnchor(2, 0.01))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_rm").toString
    val v0 = AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    assert(AnnIndex.query(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 900L)

    // retire the anchor's neighbor (the GDPR/right-to-be-forgotten
    // motion); an unknown id rides along as a no-op
    val v1 = AnnIndex.remove(spark, Seq(900L, 123456L), dir)
    assert(v1 == v0 + 1)
    val after = AnnIndex.query(spark, dir, anchor, k = 40)
      .as[(Long, Int, Double)].collect().toSeq
    assert(!after.exists(_._1 == 900L),
      s"removed vector must never be probed: $after")
    assert(after.nonEmpty, "the rest of the index must still serve")

    // a later refresh must not resurrect it
    AnnIndex.refresh(spark,
      Seq((902L, vec(888))).toDF("vec_id", "e"), dir)
    val afterRefresh = AnnIndex.query(spark, dir, anchor, k = 40)
      .as[(Long, Int, Double)].collect().toSeq
    assert(!afterRefresh.exists(_._1 == 900L),
      "removal must survive subsequent refreshes")
    // the refreshed vector serves from its OWN neighborhood — the
    // IVF contract (own cell is always probed). Asserting it appears
    // in the ANCHOR's k=40 probe instead was quantizer luck: vec(888)
    // is unrelated to the anchor, and a 2-of-8-cell probe has no
    // obligation to visit its cell.
    assert(AnnIndex.query(spark, dir, vec(888), k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 902L,
      "a refreshed vector must serve from its own neighborhood")

    // time travel still reaches the pre-removal snapshot (hard
    // erasure = remove + expireVersions, the Delta delete+vacuum
    // contract)
    val old = AnnIndex.query(spark, dir, anchor, k = 1, version = Some(v0))
      .as[(Long, Int, Double)].collect().head
    assert(old._1 == 900L, s"pre-removal snapshot must still carry 900: $old")
    VersionedTable.expireVersions(spark, AnnIndex.cellsDir(dir), keepLast = 1)
    intercept[Exception] {
      AnnIndex.query(spark, dir, anchor, k = 1, version = Some(v0)).collect()
    }
    graft.util.Fs.deleteRecursively(dir)
  }

  test("pinned query resolves a CONSISTENT (centroids, cells) pair across a rebuild") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 50).map(i => (i.toLong, vec(300 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pin").toString
    val v0 = AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    val before = AnnIndex.query(spark, dir, anchor, k = 5, version = Some(v0))
      .as[(Long, Int, Double)].collect().toSeq

    // REBUILD on a different vector set: new quantizer, new cell-id
    // space. The pinned v0 query must keep ranking v0's OWN centroids
    // — ranking the new centroids against v0's cell ids returns
    // degraded/garbage probes (the round-7 advisor find).
    val shifted = (0 until 50).map(i => (i.toLong, vec(4000 + i))) :+
      (900L, anchor.map(_ + 0.001))
    AnnIndex.build(spark, shifted.toDF("vec_id", "e"), dir)
    val pinned = AnnIndex.query(spark, dir, anchor, k = 5, version = Some(v0))
      .as[(Long, Int, Double)].collect().toSeq
    assert(pinned == before,
      s"pinned pair must be rebuild-proof:\nbefore $before\npinned $pinned")
    // and the CURRENT index answers from the new build
    assert(AnnIndex.query(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 900L)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("partitioned-cell layout: refresh preserves it; probes prune partitions") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    // 900 is NEAR the anchor (cosine < 1 after the probe's 6-digit
    // rounding); the refreshed 901 is the anchor itself (cosine
    // exactly 1.0) so the post-refresh top-1 is unambiguous
    val base = (0 until 60).map(i => (i.toLong, vec(600 + i))) :+
      (900L, anchor.map(_ + 0.05))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_part").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir,
      partitionedLayout = true)
    // the snapshot is laid out as cell=<id> partition directories
    val v = VersionedTable.currentVersion(spark, AnnIndex.cellsDir(dir)).get
    val snapDirs = new java.io.File(s"${AnnIndex.cellsDir(dir)}/v$v")
      .listFiles().filter(_.isDirectory).map(_.getName).toSeq
    assert(snapDirs.nonEmpty && snapDirs.forall(_.startsWith("cell=")),
      s"expected cell=<id> partition dirs, got $snapDirs")

    // a probe's executed plan prunes on the partition column — the
    // planning-time directory elimination the layout exists for
    val probe = AnnIndex.query(spark, dir, anchor, k = 5)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      "probe scan must carry a cell partition filter:\n" + plan.take(1200))
    assert(probe.as[(Long, Int, Double)].collect().head._1 == 900L)

    // refresh (a MERGE commit) keeps the declared layout
    AnnIndex.refresh(spark,
      Seq((901L, anchor)).toDF("vec_id", "e"), dir)
    val v2 = VersionedTable.currentVersion(spark, AnnIndex.cellsDir(dir)).get
    val snapDirs2 = new java.io.File(s"${AnnIndex.cellsDir(dir)}/v$v2")
      .listFiles().filter(_.isDirectory).map(_.getName).toSeq
    assert(snapDirs2.nonEmpty && snapDirs2.forall(_.startsWith("cell=")),
      s"refresh must preserve the partitioned layout, got $snapDirs2")
    assert(AnnIndex.query(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 901L)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("expire retires index history coherently: sidecars pruned, referenced centroids kept") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_exp").toString
    val baseA = (0 until 40).map(i => (i.toLong, vec(100 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val v0 = AnnIndex.build(spark, baseA.toDF("vec_id", "e"), dir)     // cent v0
    AnnIndex.refresh(spark, Seq((50L, vec(777))).toDF("vec_id", "e"), dir)
    val baseB = (0 until 40).map(i => (i.toLong, vec(3000 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val v2 = AnnIndex.build(spark, baseB.toDF("vec_id", "e"), dir)     // cent v1
    val v3 = AnnIndex.refresh(spark,
      Seq((51L, vec(888))).toDF("vec_id", "e"), dir)
    val cells = AnnIndex.cellsDir(dir)
    assert(Seq(v0, v2, v3) == Seq(0L, 2L, 3L))

    AnnIndex.expire(spark, dir, keepLast = 2)
    // cells history = the two newest versions, both of the SECOND
    // quantizer; their sidecars survive, the dropped ones are gone
    assert(VersionedTable.versions(spark, cells) == Seq(v2, v3))
    val sidecars = new java.io.File(cells).listFiles()
      .map(_.getName).filter(_.startsWith("_CENTROIDS_V")).toSeq.sorted
    assert(sidecars == Seq(s"_CENTROIDS_V$v2", s"_CENTROIDS_V$v3"),
      s"dropped versions' sidecars must go with them: $sidecars")
    // the first quantizer is referenced by no retained cells version
    // and expires; the second survives
    assert(VersionedTable.versions(spark, AnnIndex.centroidsDir(dir)) == Seq(1L),
      "unreferenced centroid history must expire")
    // retained pinned pairs still serve consistently
    val pinned = AnnIndex.query(spark, dir, anchor, k = 1, version = Some(v2))
      .as[(Long, Int, Double)].collect().head
    assert(pinned._1 == 900L && pinned._3 > 0.999, s"pinned pair broken: $pinned")
    assert(AnnIndex.query(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 900L)
    // dropped history is genuinely unreachable (the hard-erasure half)
    intercept[Exception] {
      AnnIndex.query(spark, dir, anchor, k = 1, version = Some(v0)).collect()
    }
    graft.util.Fs.deleteRecursively(dir)
  }

  test("compactPartitioned restores one-file-per-cell after a fragmenting refresh") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 60).map(i => (i.toLong, vec(900 + i))) :+
      (900L, anchor.map(_ + 0.05))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_cp").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir,
      partitionedLayout = true)
    val cells = AnnIndex.cellsDir(dir)
    def filesPerCell(v: Long): Map[String, Int] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$cells/v$v"))
        .filter(_.getName.startsWith("part-"))
        .groupBy(_.getParentFile.getName).view.mapValues(_.size).toMap
    }
    // a tight layout is a no-op
    assert(VersionedTable.compactPartitioned(spark, cells).isEmpty,
      "fresh build is one file per cell — nothing to compact")
    // a refresh's merge output is shuffled by vec_id: cells scatter
    // across tasks and the partition dirs fragment. At test scale AQE
    // coalesces the tiny merge to one task, so reproduce the at-scale
    // commit shape explicitly: a snapshot arriving hash-scattered by
    // vec_id across 4 tasks (exactly what a real merge commit hands
    // the writer once its output exceeds one AQE partition)
    AnnIndex.refresh(spark,
      (200 until 260).map(i => (i.toLong, vec(2000 + i)))
        .toDF("vec_id", "e"), dir)
    VersionedTable.commit(
      VersionedTable.read(spark, cells).repartition(4, col("vec_id")), cells)
    val vFrag = VersionedTable.currentVersion(spark, cells).get
    assert(filesPerCell(vFrag).values.exists(_ > 1),
      s"refresh must fragment the layout to justify the op: ${filesPerCell(vFrag)}")
    val answerBefore = AnnIndex.query(spark, dir, anchor, k = 5)
      .as[(Long, Int, Double)].collect().toSeq
    val vOpt = VersionedTable.compactPartitioned(spark, cells)
    assert(vOpt.nonEmpty, "fragmented layout must trigger a rewrite")
    assert(filesPerCell(vOpt.get).values.forall(_ == 1),
      s"compaction must restore one file per cell: ${filesPerCell(vOpt.get)}")
    // answers unchanged, layout preserved, pruning still engages
    val after = AnnIndex.query(spark, dir, anchor, k = 5)
    assert(after.as[(Long, Int, Double)].collect().toSeq == answerBefore)
    assert(after.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    // and a second run is a no-op (idempotent like compact())
    assert(VersionedTable.compactPartitioned(spark, cells).isEmpty)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("PQ layer: ADC serve equals exact serve; steady-state sync commits nothing") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 60).map(i => (i.toLong, vec(1100 + i))) :+
      (900L, anchor.map(_ + 0.01))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pq").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    val codesV0 = AnnIndex.buildPq(spark, dir)

    // at shortlist >= probed rows the exact re-rank sees every probed
    // vector, so IVFADC == exact-float serve VERBATIM (same probe rule)
    val exact = AnnIndex.query(spark, dir, anchor, k = 5)
      .as[(Long, Int, Double)].collect().toSeq
    val adc = AnnIndex.queryPq(spark, dir, anchor, k = 5, shortlist = 1000)
      .as[(Long, Int, Double)].collect().toSeq
    assert(adc == exact, s"IVFADC diverged:\nexact $exact\nadc   $adc")
    assert(adc.head._1 == 900L && adc.head._3 > 0.999)
    // a REAL shortlist still surfaces the planted neighbor: the ADC
    // front is an approximation, the near-anchor survives it
    val tight = AnnIndex.queryPq(spark, dir, anchor, k = 5, shortlist = 10)
      .as[(Long, Int, Double)].collect().toSeq
    assert(tight.head._1 == 900L, s"planted neighbor lost in ADC front: $tight")

    // nothing changed in cells: sync must return the SAME version with
    // no new commit (steady-state maintenance is free)
    assert(AnnIndex.syncCodes(spark, dir) == codesV0)
    assert(VersionedTable.currentVersion(spark,
      AnnIndex.pqCodesDir(dir)).contains(codesV0))
    graft.util.Fs.deleteRecursively(dir)
  }

  test("PQ sync reconciles refresh + remove; codes never drift from cells") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 60).map(i => (i.toLong, vec(1300 + i))) :+
      (900L, anchor.map(_ + 0.01))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pqs").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    val codesV0 = AnnIndex.buildPq(spark, dir)

    // cells move first: 901 inserts at the anchor, 900 moves far away,
    // 5 retires — then codes catch up in ONE delta-sized merge
    AnnIndex.refresh(spark,
      Seq((901L, anchor), (900L, vec(999))).toDF("vec_id", "e"), dir)
    AnnIndex.remove(spark, Seq(5L), dir)
    val codesV1 = AnnIndex.syncCodes(spark, dir)
    assert(codesV1 > codesV0)

    // codes row set == cells row set (insert, update, delete all landed)
    val cellIds = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .select(col("vec_id")).as[Long].collect().toSet
    val codeIds = VersionedTable.read(spark, AnnIndex.pqCodesDir(dir))
      .select(col("vec_id")).as[Long].collect().toSet
    assert(codeIds == cellIds, "codes must mirror cells after sync")
    assert(!codeIds.contains(5L) && codeIds.contains(901L))

    val top = AnnIndex.queryPq(spark, dir, anchor, k = 5, shortlist = 1000)
      .as[(Long, Int, Double)].collect().toSeq
    assert(top.head._1 == 901L && top.head._3 > 0.999999,
      s"synced insert must serve first: $top")
    assert(!top.exists(r => r._1 == 900L && r._3 > 0.999),
      s"moved vector must score at its NEW position: $top")
    // and a second sync on the now-settled state is again a no-op
    assert(AnnIndex.syncCodes(spark, dir) == codesV1)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("pinned PQ query resolves its (codebook, cells, centroids) lineage across a rebuild") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 50).map(i => (i.toLong, vec(1500 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pqp").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    val codesV0 = AnnIndex.buildPq(spark, dir)
    val before = AnnIndex.queryPq(spark, dir, anchor, k = 5,
      version = Some(codesV0)).as[(Long, Int, Double)].collect().toSeq

    // full rebuild on a shifted corpus: new quantizer, new codebook,
    // new codes. Scoring v0 codes with the NEW codebook (or re-ranking
    // against the new cells) is the garbage mode the lineage sidecars
    // exist to prevent.
    val shifted = (0 until 50).map(i => (i.toLong, vec(5000 + i))) :+
      (900L, anchor.map(_ + 0.001))
    AnnIndex.build(spark, shifted.toDF("vec_id", "e"), dir)
    AnnIndex.buildPq(spark, dir)
    val pinned = AnnIndex.queryPq(spark, dir, anchor, k = 5,
      version = Some(codesV0)).as[(Long, Int, Double)].collect().toSeq
    assert(pinned == before,
      s"pinned PQ lineage must be rebuild-proof:\nbefore $before\npinned $pinned")
    // and the current compressed index answers from the new build
    assert(AnnIndex.queryPq(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 900L)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("expire honors EVERY retained codes version's pinned cells lineage") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 40).map(i => (i.toLong, vec(1700 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pqe").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)   // cells v0
    val codesV0 = AnnIndex.buildPq(spark, dir)             // codes v0 -> cells v0
    val pinned0 = AnnIndex.queryPq(spark, dir, anchor, k = 3,
      version = Some(codesV0)).as[(Long, Int, Double)].collect().toSeq
    // three refreshes advance cells (v1..v3) before codes catch up
    for (i <- 0 until 3)
      AnnIndex.refresh(spark,
        Seq((950L + i, vec(8800 + i))).toDF("vec_id", "e"), dir)
    val codesV1 = AnnIndex.syncCodes(spark, dir)           // codes v1 -> cells v3

    // keepLast=2 retains BOTH codes versions; the OLDER one pins
    // cells v0, so cells retention must floor there — a
    // current-version-only widening expires v0 and the pinned query
    // dies on its re-rank (the round-8 review find)
    AnnIndex.expire(spark, dir, keepLast = 2)
    assert(VersionedTable.versions(spark, AnnIndex.pqCodesDir(dir)) ==
      Seq(codesV0, codesV1))
    assert(VersionedTable.versions(spark, AnnIndex.cellsDir(dir)).contains(0L),
      "cells v0 is pinned by retained codes v0 and must survive")
    val pinnedAfter = AnnIndex.queryPq(spark, dir, anchor, k = 3,
      version = Some(codesV0)).as[(Long, Int, Double)].collect().toSeq
    assert(pinnedAfter == pinned0,
      s"retained codes lineage broken by expire:\n$pinned0\n$pinnedAfter")

    // keepLast=1 drops codes v0 — its floor releases, cells history
    // collapses to the newest, and the old pin is genuinely erased
    AnnIndex.expire(spark, dir, keepLast = 1)
    assert(VersionedTable.versions(spark, AnnIndex.pqCodesDir(dir)) ==
      Seq(codesV1))
    assert(VersionedTable.versions(spark, AnnIndex.cellsDir(dir)) == Seq(3L))
    intercept[Exception] {
      AnnIndex.queryPq(spark, dir, anchor, k = 3,
        version = Some(codesV0)).collect()
    }
    // the current compressed serve is untouched throughout
    assert(AnnIndex.queryPq(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head._1 == 900L)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("expire floors cells on every sidecar it can still NAME when one sidecar is lost") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 40).map(i => (i.toLong, vec(2700 + i))) :+
      (900L, anchor.map(_ + 0.001))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pql").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)   // cells v0
    val codesV0 = AnnIndex.buildPq(spark, dir)             // codes v0 -> cells v0
    val pinned0 = AnnIndex.queryPq(spark, dir, anchor, k = 3,
      version = Some(codesV0)).as[(Long, Int, Double)].collect().toSeq
    for (i <- 0 until 3)
      AnnIndex.refresh(spark,
        Seq((950L + i, vec(9800 + i))).toDF("vec_id", "e"), dir)
    val codesV1 = AnnIndex.syncCodes(spark, dir)           // codes v1 -> cells v3
    // simulate a lost/cleaned lineage sidecar on the NEWER retained
    // codes version: the floor must still protect what the OLDER
    // version's surviving sidecar names. The all-or-nothing rule
    // dropped the floor entirely here — cells v0 expired and the
    // pinned queryPq died at its exact re-rank (the round-8 advisory).
    val f = new org.apache.hadoop.fs.Path(AnnIndex.pqCodesDir(dir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.delete(new org.apache.hadoop.fs.Path(
      AnnIndex.pqCodesDir(dir), s"_CELLS_V$codesV1"), false))
    AnnIndex.expire(spark, dir, keepLast = 2)
    assert(VersionedTable.versions(spark, AnnIndex.cellsDir(dir)).contains(0L),
      "cells v0 is named by retained codes v0's sidecar and must survive")
    val pinnedAfter = AnnIndex.queryPq(spark, dir, anchor, k = 3,
      version = Some(codesV0)).as[(Long, Int, Double)].collect().toSeq
    assert(pinnedAfter == pinned0,
      s"nameable pinned lineage broken by a sibling's lost sidecar:\n" +
        s"$pinned0\n$pinnedAfter")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("refresh assignment matches MLlib transform on the same centroids") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val base = (0 until 60).map(i => (i.toLong, vec(500 + i)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_asg").toString
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    // re-ingest the SAME vectors through refresh: every matched-update
    // must land in the cell build's model.transform already chose
    val builtCells = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    AnnIndex.refresh(spark, base.toDF("vec_id", "e"), dir)
    val refreshed = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(refreshed == builtCells,
      "incremental assignment must reproduce MLlib's cell for every vector")
    graft.util.Fs.deleteRecursively(dir)
  }
}
