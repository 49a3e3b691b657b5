package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The streaming incremental-dedup gate RACING the batch face's
  * snapshot advance on the same signature table — each is specced
  * alone elsewhere; this interleaving is the production shape (the
  * nightly batch refresh lands while the ingest stream keeps
  * admitting). The invariant under fire is the read-union-commit
  * cycle: with plain `commit` either writer could erase the other's
  * appended signatures (a base read before the rival's commit), which
  * is exactly the lost-update `commitMerge`'s re-derivation closes.
  *
  * Asserted: every admitted stream doc lands exactly once; the final
  * snapshot carries ALL THREE writers' rows (seed docs, every advance
  * slice doc, every admitted stream doc); each advance returns its
  * own version.
  */
class IncrDedupRaceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("streaming gate racing the batch snapshot advance loses no writer's rows") {
    val src = tmp("graft_race_src")
    val snap = tmp("graft_race_snap")
    val out = tmp("graft_race_out")
    val ckpt = tmp("graft_race_ckpt")

    // yesterday's corpus seeds the snapshot (batch-op shape, no txn
    // columns — the migration path must also hold under the race)
    val oldDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    graft.engine.VersionedTable.commit(
      graft.ops.Llm.mapOnlyBandedSignatures(
        graft.ops.Llm.shingleDocs(oldDocs)), snap)

    def docStream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src)

    // the batch face advancing the SAME snapshot from another thread,
    // appending sf0.001's refresh slice (doc_id % 5 == 0) repeatedly
    // while the stream triggers run
    val advanceVersions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val advanceErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    // the advancer runs for the WHOLE stream window (stop flag, not a
    // fixed iteration count): a fixed count can finish before the
    // first trigger commits, and the "race" then never overlaps — the
    // interleaving is ASSERTED below, not hoped for
    val stopAdvancer = new java.util.concurrent.atomic.AtomicBoolean(false)
    val advancer = new Thread(() => {
      try while (!stopAdvancer.get()) {
        advanceVersions.add(
          graft.ops.Llm.advanceIncrSnapshotAt(spark, sfSmoke, snap))
        Thread.sleep(50L)
      } catch { case t: Throwable => advanceErr.set(t) }
    }, "race-advancer")

    // unique per-doc vocabulary: stream docs never band-collide with
    // the seed or the refresh slice, so the expected admission set is
    // deterministic whatever the interleaving
    def batchDf(b: Int) = (0 until 5).map { i =>
      val id = 1000L + b * 10 + i
      (id, (0 until 6).map(j => s"tok_${id}_$j").mkString(" "))
    }.toDF("doc_id", "text")

    advancer.start()
    val streamIds = scala.collection.mutable.Set[Long]()
    (0 until 4).foreach { b =>
      batchDf(b).write.parquet(s"$src/b$b")
      streamIds ++= (0 until 5).map(i => 1000L + b * 10 + i)
      Pipelines.runStreamingIncrDedup(docStream, snap, out, ckpt)
        .awaitTermination()
    }
    stopAdvancer.set(true)
    advancer.join(180000L)
    assert(advanceErr.get() == null, s"advance failed: ${advanceErr.get()}")

    // every advance won its own version (commitMerge serialized them)
    import scala.jdk.CollectionConverters._
    val advVs = advanceVersions.asScala.toSeq
    assert(advVs.size >= 4 && advVs.distinct.size == advVs.size,
      s"versions $advVs")
    // the race actually interleaved: a version GAP between consecutive
    // advances is a commit the advancer didn't make — the stream gate
    // landing between the advancer's read-base and its next advance.
    // Without this the whole test can pass with the two writers
    // accidentally serialized, proving nothing about lost updates.
    assert(advVs.sliding(2).exists {
        case Seq(a, b) => b > a + 1
        case _ => false
      },
      s"no stream commit interleaved the advances — the race never " +
        s"overlapped: $advVs")

    // every admitted doc landed exactly once, and all were admitted
    val landed = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().toSeq
    assert(landed.distinct.size == landed.size, "duplicate landed docs")
    assert(landed.toSet == streamIds.toSet,
      s"lost/extra stream docs: ${landed.toSet.diff(streamIds.toSet)} / " +
        s"${streamIds.toSet.diff(landed.toSet)}")

    // NO WRITER'S ROWS LOST: the final snapshot carries the seed, the
    // full refresh slice (mirror of the op's doc_id % 5 slice with
    // >= 3 tokens), and every admitted stream doc
    val snapIds = graft.engine.VersionedTable.read(spark, snap)
      .select($"doc_id").distinct().as[Long].collect().toSet
    val refreshIds = graft.engine.Tables(spark, sfSmoke, "documents")
      .filter($"doc_id" % 5 === 0 &&
        size(split($"text", " ")) >= lit(3))
      .select($"doc_id").as[Long].collect().toSet
    assert(refreshIds.nonEmpty)
    // EXACT set, both directions: the three writers are the only
    // legitimate sources, so a phantom row (a duplicate admission, a
    // doc the gate should have rejected) is as much a lost-update bug
    // as a missing one — subsetOf alone passed a superset silently
    val expected = Set(1L, 2L) ++ refreshIds ++ streamIds
    assert(snapIds == expected,
      s"snapshot rows diverged — lost: ${expected.diff(snapIds)}, " +
        s"phantom: ${snapIds.diff(expected)}")
  }
}
