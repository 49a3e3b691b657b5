package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Clause-matrix semantics and the committed (versioned) face of
  * [[Merge]]. The oracle entry `q_merge_matrix` hash-gates the matrix
  * on the customer fixture; this spec pins the semantic corners the
  * fixture can't reach — clause ORDER, unclaimed-match carry-through,
  * conditional-insert rejection, ambiguity failure, and the
  * concurrent-writer re-derivation through commitMerge. */
class MergeSpec extends SparkTestBase {
  import spark.implicits._
  import Merge._

  private def target = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
    .toDF("k", "name", "v")

  test("first applicable clause wins, unclaimed matches carry through") {
    val src = Seq(
      (1L, "del"), (2L, "upd"), (3L, "noop"), (9L, "ins"), (8L, "skip"))
      .toDF("k", "op")
    val out = merge(target, src, Seq("k"), Seq(
      MatchedDelete(Some(col("s.op") === "del")),
      MatchedUpdate(Some(col("s.op") === "upd"),
        Map("v" -> lit(999))),
      NotMatchedInsert(Some(col("s.op") === "ins"),
        Map("k" -> col("s.k"), "name" -> lit("new")))))
      .orderBy("k").as[(Long, String, Option[Int])].collect().toSeq
    assert(out == Seq(
      (2L, "b", Some(999)),   // matched, delete cond false, update fires
      (3L, "c", Some(30)),    // matched, no clause fires -> unchanged
      (4L, "d", Some(40)),    // unmatched target -> carried
      (9L, "new", None)))     // insert fires; v unlisted -> NULL
    // k=1 deleted, k=8 rejected by the insert condition
  }

  test("clause order matters: update-before-delete shields the row") {
    val src = Seq((1L, "both")).toDF("k", "op")
    // both clauses applicable; declaration order decides
    val updFirst = merge(target, src, Seq("k"), Seq(
      MatchedUpdate(Some(col("s.op") === "both"), Map("v" -> lit(1))),
      MatchedDelete(None)))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(updFirst.head == ((1L, "a", 1)), s"update shields: $updFirst")
    val delFirst = merge(target, src, Seq("k"), Seq(
      MatchedDelete(None),
      MatchedUpdate(None, Map("v" -> lit(1)))))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(!delFirst.exists(_._1 == 1L), s"delete first removes: $delFirst")
  }

  test("multiple source rows matching one target row fail the merge") {
    val src = Seq((1L, "upd"), (1L, "del"), (5L, "ins")).toDF("k", "op")
    val ex = intercept[Exception] {
      merge(target, src, Seq("k"), Seq(
        MatchedUpdate(None, Map("v" -> lit(0))))).collect()
    }
    // the AMBIGUITY error specifically — a bare getMessage != null
    // accepts any crash for this input and verifies nothing about why
    // the merge failed
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    assert(chain(ex).contains("multiple source rows"),
      s"expected the ambiguity error, got: ${chain(ex).take(300)}")
    // duplicates that DON'T match the target are fine (insert side):
    // every target row carries through unchanged except k=1's update,
    // and both k=5 duplicates insert
    val okSrc = Seq((5L, "ins"), (5L, "ins2")).toDF("k", "op")
    val ok = merge(target, okSrc, Seq("k"), Seq(
      MatchedUpdate(None, Map("v" -> lit(0))),
      NotMatchedInsert(None, Map("k" -> col("s.k")))))
      .orderBy("k").select("k").as[Long].collect().toSeq
    assert(ok == (target.select("k").as[Long].collect().toSeq ++
        Seq(5L, 5L)).sorted,
      s"non-matching duplicates must both insert, rest carry: $ok")
  }

  test("ambiguity fires even when every output row is dropped") {
    // an unconditional MatchedDelete + by-source delete empties the
    // output entirely; a guard attached to output rows is evaluated
    // zero times there and the duplicate source (k=1 twice) passes
    // silently — the round-7 advisor find. The unioned poison guard
    // must still fail the job.
    val src = Seq((1L, "x"), (1L, "y"), (2L, "x"), (3L, "x"), (4L, "x"))
      .toDF("k", "op")
    val ex = intercept[Exception] {
      merge(target, src, Seq("k"), Seq(
        MatchedDelete(None),
        NotMatchedBySourceDelete(None))).collect()
    }
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    assert(chain(ex).contains("multiple source rows"),
      s"expected the ambiguity error, got: ${chain(ex).take(300)}")
    // the same all-dropping merge WITHOUT duplicates succeeds empty
    val clean = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x")).toDF("k", "op")
    assert(merge(target, clean, Seq("k"), Seq(
      MatchedDelete(None),
      NotMatchedBySourceDelete(None))).count() == 0)
  }

  test("ambiguity fires under limit-pruned partial consumption") {
    // the dual of the empty-output case: with a NON-empty output, a
    // limit(1) can satisfy its CollectLimit from the resolved child's
    // partitions and never execute the unioned poison partition — the
    // per-row broadcast guard must trip on the first row consumed
    // instead (the round-8 review find).
    val src = Seq((1L, "x"), (1L, "y"), (5L, "ins")).toDF("k", "op")
    val ex = intercept[Exception] {
      merge(target, src, Seq("k"), Seq(
        MatchedUpdate(None, Map("v" -> lit(0))),
        NotMatchedInsert(None, Map("k" -> col("s.k")))))
        .limit(1).collect()
    }
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    assert(chain(ex).contains("multiple source rows"),
      s"expected the ambiguity error, got: ${chain(ex).take(300)}")
    // a clean merge is unaffected by the per-row carrier
    val clean = Seq((1L, "x"), (5L, "ins")).toDF("k", "op")
    assert(merge(target, clean, Seq("k"), Seq(
      MatchedUpdate(None, Map("v" -> lit(0))),
      NotMatchedInsert(None, Map("k" -> col("s.k")))))
      .limit(1).collect().length == 1)
  }

  test("NOT MATCHED BY SOURCE updates and deletes unmatched target rows in order") {
    val src = Seq((1L, "x")).toDF("k", "op")
    val out = merge(target, src, Seq("k"), Seq(
      MatchedUpdate(None, Map("v" -> lit(0))),
      // delete unmatched evens, age the rest
      NotMatchedBySourceDelete(Some(col("t.k") % 2 === 0)),
      NotMatchedBySourceUpdate(None, Map("name" -> lit("stale")))))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 0),        // matched -> update
      (3L, "stale", 30)),  // unmatched odd -> aged; 2 and 4 deleted
      s"by-source family: $out")
  }

  test("same-index clauses from different families cannot cross-fire") {
    // matched update index 0 and insert index 0 both set different
    // values; by-source update index 0 sets a third — the disjoint
    // action ranges must route each population to its own clause
    val src = Seq((1L, "m"), (9L, "i")).toDF("k", "op")
    val out = merge(target, src, Seq("k"), Seq(
      MatchedUpdate(None, Map("v" -> lit(100))),
      NotMatchedInsert(None, Map("k" -> col("s.k"))),  // v unlisted -> NULL
      NotMatchedBySourceUpdate(None, Map("v" -> lit(300)))))
      .orderBy("k").as[(Long, String, Option[Int])].collect().toSeq
    assert(out == Seq(
      (1L, "a", Some(100)),
      (2L, "b", Some(300)), (3L, "c", Some(300)), (4L, "d", Some(300)),
      (9L, null, None)),
      s"families must not cross-fire: $out")
  }

  test("mergeVersioned re-derives under a concurrent-writer race") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_vt").toString
    val schema = target.schema
    VersionedTable.commit(target, dir)
    // two writers merge DISJOINT key sets concurrently; re-derivation
    // must apply both (a lost update would drop one writer's rows)
    val srcA = Seq((1L, 111)).toDF("k", "nv")
    val srcB = Seq((2L, 222)).toDF("k", "nv")
    def clausesOf(): Seq[Clause] = Seq(
      MatchedUpdate(None, Map("v" -> col("s.nv"))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      // generous attempt budget: under a fully loaded test JVM a
      // conflicted derivation can take long enough that the default
      // 10-attempt budget flakes
      val fa = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = mergeVersioned(spark, dir, srcA, Seq("k"),
          clausesOf(), Some(schema), maxAttempts = 40)
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = mergeVersioned(spark, dir, srcB, Seq("k"),
          clausesOf(), Some(schema), maxAttempts = 40)
      })
      fa.get(); fb.get()
    } finally pool.shutdown()
    val fin = VersionedTable.read(spark, dir)
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(fin == Seq((1L, "a", 111), (2L, "b", 222),
      (3L, "c", 30), (4L, "d", 40)),
      s"both concurrent merges must land: $fin")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("syncMirror replays source DML incrementally and idempotently") {
    val src = java.nio.file.Files.createTempDirectory("graft_sync_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_sync_dst").toString
    graft.util.Fs.deleteRecursively(dst)
    def srcRows = VersionedTable.read(spark, src)
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    def dstRows = VersionedTable.read(spark, dst)
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    VersionedTable.commit(target, src)
    // bootstrap
    assert(Merge.syncMirror(spark, src, dst, Seq("k")) == 0L)
    assert(dstRows == srcRows)
    // DML on the source: delete, update, insert — then one sync
    VersionedTable.deleteWhere(spark, src, col("k") === 2L)
    VersionedTable.updateWhere(spark, src, col("k") === 3L,
      Map("v" -> lit(333)))
    VersionedTable.commit(VersionedTable.read(spark, src)
      .unionByName(Seq((9L, "i", 90)).toDF("k", "name", "v")), src)
    assert(Merge.syncMirror(spark, src, dst, Seq("k")) == 3L)
    assert(dstRows == srcRows, s"mirror must track: $dstRows vs $srcRows")
    // caught up: a re-sync commits nothing
    val vBefore = VersionedTable.currentVersion(spark, dst)
    assert(Merge.syncMirror(spark, src, dst, Seq("k")) == 3L)
    assert(VersionedTable.currentVersion(spark, dst) == vBefore,
      "caught-up sync must not commit")
    // crash window: cursor lost after apply — re-running re-applies
    // the same changes idempotently
    VersionedTable.atomicWrite(spark, dst, "_SYNC_CURSOR", "0")
    Merge.syncMirror(spark, src, dst, Seq("k"))
    assert(dstRows == srcRows, "re-applied window must be idempotent")
    Seq(src, dst).foreach(graft.util.Fs.deleteRecursively)
  }

  test("mergeVersioned bootstraps an absent table from inserts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_bs").toString
    graft.util.Fs.deleteRecursively(dir)
    val src = Seq((7L, "x")).toDF("k", "nm")
    mergeVersioned(spark, dir, src, Seq("k"), Seq(
      NotMatchedInsert(None, Map(
        "k" -> col("s.k"), "name" -> col("s.nm"), "v" -> lit(0)))),
      Some(target.schema))
    val fin = VersionedTable.read(spark, dir)
      .as[(Long, String, Int)].collect().toSeq
    assert(fin == Seq((7L, "x", 0)), s"bootstrap insert: $fin")
    graft.util.Fs.deleteRecursively(dir)
  }
}
