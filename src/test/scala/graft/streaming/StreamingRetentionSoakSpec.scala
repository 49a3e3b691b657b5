package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.engine.{AnnIndex, VersionedTable}

/** The long-running-stream maintenance story (round-7 directive #7):
  * the streaming ANN refresh and the streaming incremental dedup both
  * grow their versioned tables one commit per micro-batch, so a real
  * deployment runs compact/expire retention BESIDE the stream. These
  * soaks drive N triggers with a concurrent maintenance thread
  * looping exactly that, and pin the contract: probes/gates stay
  * answer-correct at every point, no maintenance call ever throws,
  * retained history is gapless (a contiguous newest suffix), and
  * retention never erases state the CURRENT serve path needs (the
  * codes table's pinned cells snapshot; the dedup gate's accumulated
  * signatures — expiry drops VERSIONS, never signature content). */
class StreamingRetentionSoakSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("soak: streaming ANN refresh + PQ sync under concurrent compact/expire") {
    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian())
    }
    val anchor = vec(1)
    val base = (0 until 40).map(i => (i.toLong, vec(100 + i)))
    val dir = tmp("graft_soakann_idx")
    val src = tmp("graft_soakann_src")
    val ckpt = tmp("graft_soakann_ck")
    AnnIndex.build(spark, base.toDF("vec_id", "e"), dir)
    AnnIndex.buildPq(spark, dir)

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var stop = false
    val maint = new Thread(() => {
      while (!stop) {
        try {
          VersionedTable.compactIfFragmented(spark,
            AnnIndex.cellsDir(dir), targetFiles = 4)
          AnnIndex.expire(spark, dir, keepLast = 3)
        } catch { case t: Throwable => failures.add(t) }
        Thread.sleep(20)
      }
    }, "soak-ann-maintenance")
    maint.start()

    val rounds = 6
    try {
      for (r <- 1 to rounds) {
        // each round lands one vector through the stream; round 4's
        // IS the anchor, so every later probe has a known exact answer
        val v = if (r == 4) anchor else vec(7000 + r)
        Seq((800L + r, v)).toDF("vec_id", "e").write.parquet(s"$src/b$r")
        Pipelines.runStreamingAnnRefresh(
          spark.readStream.schema("vec_id LONG, e ARRAY<DOUBLE>")
            .option("recursiveFileLookup", "true").parquet(src),
          dir, ckpt).awaitTermination()
        AnnIndex.syncCodes(spark, dir)
        // both serve paths answer mid-soak, racing the maintenance
        val top = AnnIndex.query(spark, dir, anchor, k = 1)
          .as[(Long, Int, Double)].collect().head
        val topPq = AnnIndex.queryPq(spark, dir, anchor, k = 1)
          .as[(Long, Int, Double)].collect().head
        if (r >= 4) {
          assert(top._1 == 804L && top._3 > 0.999999,
            s"round $r: float probe lost the landed anchor: $top")
          assert(topPq._1 == 804L,
            s"round $r: PQ probe lost the landed anchor: $topPq")
        } else
          // the PQ shortlist covers the whole probed set at this size,
          // so the two paths must agree verbatim even on noise
          assert(topPq == top,
            s"round $r: serve paths diverged: float $top pq $topPq")
      }
    } finally { stop = true; maint.join() }
    assert(failures.isEmpty,
      s"maintenance surfaced ${failures.size} failures, first: ${failures.peek()}")

    // every streamed vector is in the final snapshot (nothing lost to
    // a compact/expire race), and history is a gapless newest suffix
    val ids = VersionedTable.read(spark, AnnIndex.cellsDir(dir))
      .select($"vec_id").as[Long].collect().toSet
    assert((1 to rounds).forall(r => ids.contains(800L + r)),
      s"streamed vectors missing from the index: $ids")
    val vs = VersionedTable.versions(spark, AnnIndex.cellsDir(dir))
    assert(vs == (vs.head to vs.last).toSeq,
      s"cells history must be contiguous, got $vs")
    val cvs = VersionedTable.versions(spark, AnnIndex.pqCodesDir(dir))
    assert(cvs == (cvs.head to cvs.last).toSeq,
      s"codes history must be contiguous, got $cvs")

    // a final quiesced retention pass lands the steady state: 3 cells
    // versions (the last sync pinned the newest, so no widening), 3
    // codes versions, and the compressed path still serves
    AnnIndex.expire(spark, dir, keepLast = 3)
    assert(VersionedTable.versions(spark, AnnIndex.cellsDir(dir)).size == 3)
    assert(VersionedTable.versions(spark, AnnIndex.pqCodesDir(dir)).size <= 3)
    val finalPq = AnnIndex.queryPq(spark, dir, anchor, k = 1)
      .as[(Long, Int, Double)].collect().head
    assert(finalPq._1 == 804L,
      s"post-retention PQ serve must still answer: $finalPq")
    Seq(dir, src, ckpt).foreach(graft.util.Fs.deleteRecursively)
  }

  test("soak: streaming incr dedup under concurrent snapshot compact/expire") {
    val src = tmp("graft_soakdd_src")
    val snap = tmp("graft_soakdd_snap")
    val out = tmp("graft_soakdd_out")
    val ckpt = tmp("graft_soakdd_ck")

    // per-round novel 10-word documents over disjoint vocabularies;
    // dup(r) re-sends an EARLIER round's exact text
    def novel(r: Int): String = (0 until 10).map(i => s"w${r}x$i").mkString(" ")
    VersionedTable.commit(
      graft.ops.Llm.mapOnlyBandedSignatures(graft.ops.Llm.shingleDocs(
        Seq((1L, novel(0))).toDF("doc_id", "text"))), snap)

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var stop = false
    val maint = new Thread(() => {
      while (!stop) {
        try {
          VersionedTable.compactIfFragmented(spark, snap, targetFiles = 4)
          VersionedTable.expireVersions(spark, snap, keepLast = 2)
        } catch { case t: Throwable => failures.add(t) }
        Thread.sleep(20)
      }
    }, "soak-dedup-maintenance")
    maint.start()

    def docStream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true").parquet(src)

    val rounds = 6
    try {
      for (r <- 1 to rounds) {
        // doc 10r duplicates the PREVIOUS round's admitted novel doc
        // (the seed doc for round 1): expiry of old snapshot VERSIONS
        // must never lose accumulated signature CONTENT, or this dup
        // slips the gate. Doc 10r+1 is novel.
        Seq((10L * r, novel(r - 1)), (10L * r + 1, novel(r)))
          .toDF("doc_id", "text").write.parquet(s"$src/b$r")
        Pipelines.runStreamingIncrDedup(docStream, snap, out, ckpt)
          .awaitTermination()
        val admitted = spark.read.parquet(out)
          .select($"doc_id").as[Long].collect().toSet
        assert(admitted == (1 to r).map(10L * _ + 1).toSet,
          s"round $r: gate drifted under maintenance: $admitted")
      }
    } finally { stop = true; maint.join() }
    assert(failures.isEmpty,
      s"maintenance surfaced ${failures.size} failures, first: ${failures.peek()}")

    // retained snapshot history is a gapless newest suffix and the
    // accumulated signatures cover every admitted doc
    val vs = VersionedTable.versions(spark, snap)
    assert(vs == (vs.head to vs.last).toSeq,
      s"snapshot history must be contiguous, got $vs")
    val sigDocs = VersionedTable.read(spark, snap)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert((1 to rounds).forall(r => sigDocs.contains(10L * r + 1)),
      s"expiry lost admitted signatures: $sigDocs")
    Seq(src, snap, out, ckpt).foreach(graft.util.Fs.deleteRecursively)
  }
}
