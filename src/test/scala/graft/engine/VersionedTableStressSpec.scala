package graft.engine

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Concurrency SOAK for the VersionedTable commit protocol: the point
  * races (claim loss, stale-claim retry, vacuum-vs-publish) each have
  * a deterministic spec; this one runs the whole maintenance surface
  * at once — N committers x M rounds of `commitRetrying` against a
  * maintenance thread looping `compact` + `expireVersions` +
  * `vacuumStaged` on the same table — and asserts the global
  * invariants that make the protocol linearizable:
  *
  *  - every claimed version number is published exactly once (the
  *    history is gapless: maxVersion + 1 == successful commits);
  *  - every surviving writer version reads back as exactly the
  *    snapshot its writer staged (no torn or clobbered snapshots);
  *  - compacted versions are whole copies of some committed payload;
  *  - no `.stage_*` dirs leak once the writers stop.
  */
class VersionedTableStressSpec extends SparkTestBase {
  import spark.implicits._

  test("soak: racing committers + compact + expire + vacuum stay linearizable") {
    val dir = Files.createTempDirectory("graft_vt_soak").toString
    val writers = 4
    val rounds = 5
    val rowsPerCommit = 50

    def payload(tag: String) =
      spark.range(0, rowsPerCommit).toDF("k")
        .withColumn("tag", lit(tag))

    // seed so maintenance has something to chew on immediately
    VersionedTable.commit(payload("seed"), dir)

    val committed = new ConcurrentLinkedQueue[(Long, String)]()
    val compacted = new ConcurrentLinkedQueue[Long]()
    val failures = new ConcurrentLinkedQueue[Throwable]()

    val writerThreads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          for (r <- 0 until rounds) {
            val tag = s"w${w}_r$r"
            // generous attempts: 4 writers + compaction all race the
            // same version counter, and losing IS the exercised path
            val v = VersionedTable.commitRetrying(
              payload(tag), dir, maxAttempts = 60)
            committed.add((v, tag))
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"soak-writer-$w")
    }

    @volatile var writersDone = false
    val maintenance = new Thread(() => {
      try {
        while (!writersDone) {
          // compact loses claims to live writers sometimes — that is
          // the protocol working, not a failure; retry next loop.
          // compactIfFragmented: only REAL compaction commits are
          // recorded (compact() is idempotent and returns the current
          // version on a no-op, which is some writer's version)
          try VersionedTable.compactIfFragmented(spark, dir, targetFiles = 1)
            .foreach(compacted.add(_))
          catch { case _: ConcurrentCommitException => }
          // keep a deep-enough tail that a committer's just-read base
          // schema (at most a few versions behind head) never expires
          // out from under its footer read
          VersionedTable.expireVersions(spark, dir, keepLast = 12)
          // age guard: live stage dirs are seconds old, never touched
          VersionedTable.vacuumStaged(spark, dir)
          Thread.sleep(50L)
        }
      } catch { case t: Throwable => failures.add(t) }
    }, "soak-maintenance")

    maintenance.start()
    writerThreads.foreach(_.start())
    writerThreads.foreach(_.join(300000L))
    writersDone = true
    maintenance.join(60000L)

    assert(failures.isEmpty, {
      val f = failures.peek()
      s"soak surfaced ${failures.size} failures, first: $f"
    })

    import scala.jdk.CollectionConverters._
    val byVersion = committed.asScala.toSeq
    val compactVs = compacted.asScala.toSeq

    // every commit succeeded and landed on its own version
    assert(byVersion.size == writers * rounds)
    val allVs = byVersion.map(_._1) ++ compactVs :+ 0L
    assert(allVs.distinct.size == allVs.size,
      s"two commits claim the same version: ${allVs.sorted}")

    // gapless history: version numbers are consumed exactly once and
    // always published — the linearizable-claim property
    assert(allVs.max == allVs.size - 1,
      s"history has gaps: max=${allVs.max} commits=${allVs.size}")

    val live = VersionedTable.versions(spark, dir)
    assert(live == live.sorted && live.distinct == live)
    assert(VersionedTable.currentVersion(spark, dir).contains(live.max))

    // surviving writer snapshots read back whole and untouched
    val tagOf = byVersion.toMap
    live.filter(tagOf.contains).foreach { v =>
      val rows = VersionedTable.read(spark, dir, Some(v))
        .groupBy(col("tag")).count().as[(String, Long)].collect().toSeq
      assert(rows == Seq((tagOf(v), rowsPerCommit.toLong)),
        s"v$v torn or clobbered: $rows")
    }
    // surviving compaction snapshots are whole copies of SOME payload
    val legalTags = (tagOf.values.toSet + "seed")
    live.filter(compactVs.contains).foreach { v =>
      val rows = VersionedTable.read(spark, dir, Some(v))
        .groupBy(col("tag")).count().as[(String, Long)].collect().toSeq
      assert(rows.size == 1 && legalTags(rows.head._1) &&
        rows.head._2 == rowsPerCommit.toLong,
        s"compacted v$v is not a whole copy: $rows")
    }

    // nothing staged leaks once writers stop: a zero-age vacuum finds
    // nothing because losers already cleaned up after themselves
    assert(VersionedTable.vacuumStaged(spark, dir, olderThanMs = 0L).isEmpty)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".stage_")),
      "a staged snapshot dir leaked past the soak")
  }
}
