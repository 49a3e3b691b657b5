package graft.engine

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class VersionedTableSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Overwrite a metadata file BEHIND the Hadoop FS (simulating a
    * crash/corruption), dropping the local-FS checksum sidecar so the
    * next Hadoop read sees the content, not a ChecksumException. */
  private def clobber(dir: String, name: String, content: String): Unit = {
    Files.writeString(Paths.get(dir, name), content)
    Files.deleteIfExists(Paths.get(dir, s".$name.crc"))
  }

  test("commitChecked enforces CHECK constraints with null-as-violation, nothing staged on reject") {
    val dir = tmp("graft_vt_check")
    val good = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    assert(VersionedTable.commitChecked(good, dir,
      Seq("v > 0", "k IS NOT NULL")) == 0L)
    // violating rows (one negative, one NULL — null must count as a
    // violation, Delta semantics) reject with per-check counts and
    // leave the table exactly as it was
    val bad = Seq((3L, -1.0), (4L, Double.NaN), (5L, 30.0))
      .toDF("k", "v")
      .withColumn("v", when($"k" === 4L, lit(null)).otherwise($"v"))
    val e = intercept[CheckConstraintException] {
      VersionedTable.commitChecked(bad, dir, Seq("v > 0"))
    }
    assert(e.getMessage.contains("2 violating rows"), e.getMessage)
    assert(VersionedTable.currentVersion(spark, dir).contains(0L))
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".stage_")), "reject must precede staging")
    // a later clean commit proceeds normally
    assert(VersionedTable.commitChecked(
      Seq((6L, 1.0)).toDF("k", "v"), dir, Seq("v > 0")) == 1L)
  }

  test("restore re-commits an old snapshot as a new version; history intact") {
    val dir = tmp("graft_vt_restore")
    VersionedTable.commit(Seq((1L, "good")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "bad"), (2L, "bad2")).toDF("k", "v"), dir)
    val v = VersionedTable.restore(spark, dir, 0L)
    assert(v == 2L, "restore is a NEW version, not a pointer rollback")
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].collect().toSeq == Seq((1L, "good")))
    // the bad intermediate stays time-travelable (the rollback is auditable)
    assert(VersionedTable.read(spark, dir, Some(1L)).count() == 2)
    intercept[IllegalArgumentException] {
      VersionedTable.restore(spark, dir, 99L)
    }
    // restore must roll back ACROSS a schema evolution — the gate
    // that protects normal commits would read this as a dropped
    // column, and a RESTORE that can't undo a schema change is
    // missing half its job
    VersionedTable.commit(
      Seq((9L, "evolved", 1.5)).toDF("k", "v", "extra"), dir,
      allowEvolution = true)
    val back = VersionedTable.restore(spark, dir, 0L)
    assert(VersionedTable.read(spark, dir, Some(back)).columns.toSeq ==
      Seq("k", "v"))
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].collect().toSeq == Seq((1L, "good")))
  }

  test("time-based retention validates the age and spares an unpointed head") {
    val dir = tmp("graft_vt_agehead")
    VersionedTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir)
    intercept[IllegalArgumentException] {
      VersionedTable.expireOlderThan(spark, dir, 0L)
    }
    // simulate a writer that died between snapshot rename and pointer
    // swap: v1 published + claimed, pointer regressed to v0 — even
    // ancient, the unpointed head is committed data awaiting the
    // roll-forward repair and must never be expired
    clobber(dir, "_CURRENT", "v0")
    for (v <- Seq(0L, 1L)) {
      val d = new java.io.File(s"$dir/v$v")
      (d +: d.listFiles().toSeq).foreach(
        _.setLastModified(System.currentTimeMillis() - 7200 * 1000L))
    }
    assert(VersionedTable.expireOlderThan(spark, dir, 3600 * 1000L).isEmpty,
      "neither the pointer nor the unpointed head may expire")
    // the next commit completes the dead writer's commit on top of v1
    val v2 = VersionedTable.commit(Seq((1L, "v2")).toDF("k", "v"), dir)
    assert(v2 == 2L)
    assert(VersionedTable.read(spark, dir, Some(1L))
      .as[(Long, String)].head() == ((1L, "v1")))
  }

  test("time-based retention expires only old-enough snapshots, never the current") {
    val dir = tmp("graft_vt_age")
    VersionedTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "v2")).toDF("k", "v"), dir)
    // nothing is older than an hour yet
    assert(VersionedTable.expireOlderThan(spark, dir, 3600 * 1000L).isEmpty)
    // age v0 and v1 behind the cutoff by back-dating every file mtime
    for (v <- Seq(0L, 1L)) {
      val d = new java.io.File(s"$dir/v$v")
      (d +: d.listFiles().toSeq).foreach(
        _.setLastModified(System.currentTimeMillis() - 7200 * 1000L))
    }
    assert(VersionedTable.expireOlderThan(spark, dir, 3600 * 1000L) ==
      Seq(0L, 1L))
    assert(VersionedTable.versions(spark, dir) == Seq(2L))
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].head() == ((1L, "v2")))
    // even an ancient CURRENT version survives
    val d2 = new java.io.File(s"$dir/v2")
    (d2 +: d2.listFiles().toSeq).foreach(
      _.setLastModified(System.currentTimeMillis() - 7200 * 1000L))
    assert(VersionedTable.expireOlderThan(spark, dir, 3600 * 1000L).isEmpty)
    assert(VersionedTable.read(spark, dir).count() == 1)
  }

  test("commitMerge repairs a crashed predecessor's unpointed version, merging the real head") {
    val dir = tmp("graft_vt_mergewedge")
    VersionedTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir)
    // simulate a writer that died between snapshot rename and pointer
    // swap: v1 + claim exist, pointer regressed to v0
    clobber(dir, "_CURRENT", "v0")
    val v = VersionedTable.commitMerge(spark, dir) { base =>
      base.get.withColumn("v", lit("merged"))
    }
    // rolled forward to v1 first (no permanent wedge), THEN merged on
    // top of the real head — the derivation must see v1, not v0
    assert(v == 2L)
    assert(VersionedTable.read(spark, dir)
      .select($"v").as[String].head() == "merged")
    assert(VersionedTable.read(spark, dir, Some(1L))
      .select($"v").as[String].head() == "v1")
  }

  test("commit advances versions; read resolves the pointer; time travel works") {
    val dir = tmp("graft_vt")
    assert(VersionedTable.currentVersion(spark, dir).isEmpty)
    val v0 = VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), dir)
    val v1 = VersionedTable.commit(Seq((1L, "b"), (2L, "c")).toDF("k", "v"), dir)
    assert((v0, v1) == (0L, 1L))
    assert(VersionedTable.versions(spark, dir) == Seq(0L, 1L))
    assert(VersionedTable.read(spark, dir).count() == 2)
    // time travel to v0
    val old = VersionedTable.read(spark, dir, Some(0L))
      .as[(Long, String)].collect().toSeq
    assert(old == Seq((1L, "a")))
  }

  test("expireVersions keeps the newest n and the current pointer; retained time travel still works") {
    val dir = tmp("graft_vt_expire")
    VersionedTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "v2")).toDF("k", "v"), dir)
    val expired = VersionedTable.expireVersions(spark, dir, keepLast = 2)
    assert(expired == Seq(0L))
    assert(VersionedTable.versions(spark, dir) == Seq(1L, 2L))
    // current read unaffected; time travel to a RETAINED version works
    assert(VersionedTable.read(spark, dir).as[(Long, String)].head() == ((1L, "v2")))
    assert(VersionedTable.read(spark, dir, Some(1L))
      .as[(Long, String)].head() == ((1L, "v1")))
    // expiring everything but the current version is a no-op for reads
    assert(VersionedTable.expireVersions(spark, dir, keepLast = 1) == Seq(1L))
    assert(VersionedTable.read(spark, dir).count() == 1)
  }

  test("compact merges small files into a new version; old versions untouched") {
    val dir = tmp("graft_vt_compact")
    val wide = spark.range(0, 1000).toDF("k")
      .withColumn("v", col("k") * 2).repartition(16)
    val v0 = VersionedTable.commit(wide, dir)
    def dataFiles(v: Long) =
      new java.io.File(s"$dir/v$v").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(dataFiles(v0) == 16, "fixture must start fragmented")
    val v1 = VersionedTable.compact(spark, dir, targetFiles = 2)
    assert(v1 == v0 + 1)
    assert(dataFiles(v1) <= 2, "compaction must hit the file target")
    // same data, new layout; pre-compaction snapshot still time-travels
    assert(VersionedTable.read(spark, dir).agg(sum("v")).head().getLong(0)
      == 999L * 1000L)
    assert(VersionedTable.read(spark, dir, Some(v0)).count() == 1000)
  }

  test("UPDATE assignments all read the pre-update row; unknown columns rejected") {
    val dir = tmp("graft_vt_swap")
    VersionedTable.commit(
      Seq((1L, 10L, 20L), (2L, 1L, 2L)).toDF("k", "a", "b"), dir)
    // SET a=b, b=a must SWAP (SQL UPDATE: every RHS sees the
    // pre-image) — the sequential-fold bug left both columns = old b
    VersionedTable.updateWhere(spark, dir, col("k") === 1L,
      Map("a" -> col("b"), "b" -> col("a")))
    val got = VersionedTable.read(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 20L, 10L), (2L, 1L, 2L)), s"swap corrupted: $got")
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, dir, lit(true),
        Map("nope" -> lit(1)))
    }
  }

  test("changelog: null keys pair across versions; added columns carry their changes") {
    val dir = tmp("graft_vt_cdfnull")
    def frame(vals: Seq[(Long, String)]) = vals.toDF("k", "v")
      .withColumn("k", when(col("k") === 0L, lit(null)).otherwise(col("k")))
    val v0 = VersionedTable.commit(frame(Seq((1L, "a"), (0L, "n"))), dir)
    val v1 = VersionedTable.commit(frame(Seq((1L, "a"), (0L, "n"))), dir)
    // a null-keyed row present unchanged in both versions must emit
    // NOTHING — the null-unsafe join reported it as delete + insert
    assert(VersionedTable.changesBetween(spark, dir, v0, v1, Seq("k"))
      .count() == 0, "identical snapshots must produce an empty changelog")
    assert(VersionedTable.diffVersions(spark, dir, "k", v0, v1).count() == 0)
    // schema evolution between the versions: both rows gain column s
    // — a pre-snapshot-only column view dropped these changes entirely
    val v2 = VersionedTable.commit(
      frame(Seq((1L, "a"), (0L, "n")))
        .withColumn("s", when(col("k") === 1L, 9L).otherwise(0L)),
      dir, allowEvolution = true)
    val ch = VersionedTable.changesBetween(spark, dir, v1, v2, Seq("k"))
    assert(ch.filter(col("_change_type").isin("insert", "delete")).count() == 0,
      "evolution must not masquerade as inserts/deletes")
    assert(ch.filter(col("_change_type") === "update_postimage").count() == 2,
      "added-column changes must surface as updates")
    assert(ch.filter(col("_change_type") === "update_postimage" &&
        col("k") === 1L).select(col("s")).as[Long].head() == 9L,
      "the postimage must carry the added column's value")
  }

  test("vacuum collects aged atomicWrite temp orphans beside staged snapshots") {
    val dir = tmp("graft_vt_tmpvac")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), dir)
    val orphan = new java.io.File(dir, "._CURRENT.tmpdeadbeef")
    Files.writeString(orphan.toPath, "junk")
    assert(orphan.setLastModified(System.currentTimeMillis() - 7200 * 1000L))
    val removed = VersionedTable.vacuumStaged(spark, dir)
    assert(!orphan.exists, "aged tmp orphan must be vacuumed")
    assert(removed.exists(_.contains("tmpdeadbeef")))
    // the live metadata survives
    assert(VersionedTable.read(spark, dir).count() == 1)
  }

  test("readPruned: partition columns survive, unprunable ranges degrade") {
    val dir = tmp("graft_vt_partprune")
    VersionedTable.setPartitionColumns(spark, dir, Seq("cell"))
    VersionedTable.setStatsColumns(spark, dir, Seq("x"))
    val df = spark.range(0, 256).toDF("x")
      .withColumn("cell", (col("x") % 4).cast("int"))
    VersionedTable.commit(df.repartition(col("cell")), dir)
    val (pr, _, _) = VersionedTable.readPruned(spark, dir,
      Map("x" -> ((0L, 50L))))
    // a bare leaf-file read drops directory-encoded partition columns
    assert(pr.columns.contains("cell"),
      s"partition column lost from the pruned read: ${pr.columns.toSeq}")
    assert(pr.count() == 51)
    // no ranges: the plain scan, not an empty-reduce crash
    assert(VersionedTable.readPruned(spark, dir, Map.empty)._1.count() == 256)
    // a range on a column the manifest has no stats for: exact result
    // via the documented full-scan fallback, not an AnalysisException
    val (nf, r2, _) = VersionedTable.readPruned(spark, dir,
      Map("cell" -> ((1L, 2L))))
    assert(r2 == -1 && nf.count() == 128)
  }

  test("diffVersions emits insert/delete/update between snapshots, drops unchanged") {
    val dir = tmp("graft_vt_diff")
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v"), dir)
    val diff = VersionedTable.diffVersions(spark, dir, "k", 0L, 1L)
      .as[(Long, String)].collect().toMap
    assert(diff == Map(2L -> "update", 3L -> "delete", 4L -> "insert"),
      s"got $diff") // key 1 unchanged -> absent
  }

  test("z-ordered commitWithStats prunes files on 2-D range predicates, same results") {
    val dir = tmp("graft_vt_skip")
    graft.functions.ZOrder.register(spark)
    val data = spark.range(0, 4096).toDF("i")
      .select((col("i") / 64).cast("long").as("x"), (col("i") % 64).as("y"),
        col("i").as("payload"))
    val zordered = data
      .withColumn("z", expr("zorder2(x, y)"))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
    VersionedTable.commitWithStats(zordered, dir, Seq("x", "y"))
    val ranges = Map("x" -> ((3L, 10L)), "y" -> ((5L, 12L)))
    val (pruned, read, total) = VersionedTable.readPruned(spark, dir, ranges)
    assert(total == 16, s"expected 16 files, got $total")
    assert(read < total, s"selective 2-D range must skip files ($read/$total)")
    val expected = VersionedTable.read(spark, dir)
      .filter(col("x").between(3, 10) && col("y").between(5, 12))
      .agg(sum("payload"), count(lit(1))).head()
    val got = pruned.agg(sum("payload"), count(lit(1))).head()
    assert(got == expected, "pruned read must equal the full filtered scan")
    // pruning must also hold on the SECOND dimension alone — the
    // property a 1-D sort cannot give
    val (_, readY, totalY) = VersionedTable.readPruned(
      spark, dir, Map("y" -> ((0L, 7L))))
    assert(readY < totalY, s"y-only range must also skip files ($readY/$totalY)")
  }

  test("commitWithStats leaves the stats declaration untouched when the commit is rejected") {
    val dir = tmp("graft_vt_statsroll")
    VersionedTable.commit(Seq((1L, 2L)).toDF("x", "y"), dir)
    // schema-breaking frame: the commit throws and the _STATS_COLS
    // declaration must not stick — otherwise every later plain commit
    // pays a full-snapshot stats aggregate for columns nobody
    // successfully registered (the round-8 review find; round 10 moved
    // registration AFTER the commit, so rejection now touches nothing
    // and the former rollback's concurrent-writer flip-flop is gone)
    intercept[Exception] {
      VersionedTable.commitWithStats(
        Seq(("a", 2L)).toDF("x", "y"), dir, Seq("x"))
    }
    assert(!new java.io.File(dir, "_STATS_COLS").exists(),
      "rejected commit must not leave the stats property behind")
    val v = VersionedTable.commit(Seq((3L, 4L)).toDF("x", "y"), dir)
    assert(!new java.io.File(dir, s"manifest_v$v").exists(),
      "no manifest may be auto-written after the rollback")
    // with a PRIOR declaration, a rejected commit restores it
    VersionedTable.commitWithStats(Seq((5L, 6L)).toDF("x", "y"), dir, Seq("y"))
    intercept[Exception] {
      VersionedTable.commitWithStats(
        Seq(("a", 2L)).toDF("x", "y"), dir, Seq("x"))
    }
    val v2 = VersionedTable.commit(Seq((7L, 8L)).toDF("x", "y"), dir)
    assert(new java.io.File(dir, s"manifest_v$v2").exists(),
      "the prior declaration must survive the rejected re-declaration")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("auto-stats: DML and merge commits keep the skipping manifest; post-DML reads still prune") {
    val dir = tmp("graft_vt_autostats")
    graft.functions.ZOrder.register(spark)
    val data = spark.range(0, 4096).toDF("i")
      .select((col("i") / 64).cast("long").as("x"), (col("i") % 64).as("y"),
        col("i").as("payload"))
    val zordered = data
      .withColumn("z", expr("zorder2(x, y)"))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
    // registers x,y as the table's stats columns (sidecar)
    VersionedTable.commitWithStats(zordered, dir, Seq("x", "y"))
    // the round-7 gap: these commit paths produced versions with NO
    // manifest, silently degrading readPruned to full scans forever
    VersionedTable.deleteWhere(spark, dir, col("payload") % 97 === 0)
    VersionedTable.updateWhere(spark, dir, col("payload") % 95 === 0,
      Map("payload" -> lit(0L)))
    val (pruned, read, total) = VersionedTable.readPruned(
      spark, dir, Map("x" -> ((3L, 10L)), "y" -> ((5L, 12L))))
    assert(total > 0, "post-DML version must carry an auto-written manifest")
    assert(read < total, s"post-DML version must still prune ($read/$total)")
    // both Z-order dims independently — the layout survives filter-
    // shaped DML (no shuffle re-orders the clustered files)
    val (_, readY, totalY) = VersionedTable.readPruned(
      spark, dir, Map("y" -> ((0L, 7L))))
    assert(totalY > 0 && readY < totalY,
      s"y-only range must still skip files post-DML ($readY/$totalY)")
    // and the pruned read is still exactly the filtered scan
    val expected = VersionedTable.read(spark, dir)
      .filter(col("x").between(3, 10) && col("y").between(5, 12))
      .agg(sum("payload"), count(lit(1))).head()
    assert(pruned.agg(sum("payload"), count(lit(1))).head() == expected)
  }

  test("upsert: updates win by key, unmatched base survives") {
    val base = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val updates = Seq((1L, "new"), (3L, "ins")).toDF("k", "v")
    val got = VersionedTable.upsert(base, updates, "k")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "keep", 3L -> "ins"))
  }

  test("streaming refresh: per-batch upsert commits, serving table converges") {
    val src = tmp("graft_refresh_src")
    val serving = tmp("graft_refresh_serving")
    val ckpt = tmp("graft_refresh_ckpt")
    val schema = "k LONG, v STRING"

    Files.writeString(Paths.get(src, "b1.json"),
      """{"k": 1, "v": "a"}
        |{"k": 2, "v": "b"}""".stripMargin)
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).json(src)
      val q = graft.streaming.Pipelines.runRefresh(stream, "k", serving, ckpt)
      q.awaitTermination()
    }
    run()
    assert(VersionedTable.read(spark, serving).count() == 2)

    // second batch updates k=2 and inserts k=3
    Files.writeString(Paths.get(src, "b2.json"),
      """{"k": 2, "v": "B2"}
        |{"k": 3, "v": "c"}""".stripMargin)
    run()
    val got = VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
    // prior snapshot still readable
    assert(VersionedTable.versions(spark, serving).size >= 2)
  }

  test("expireVersions removes the expired version's stats manifest with it") {
    val dir = tmp("graft_vt_expman")
    VersionedTable.commitWithStats(
      Seq((1L, "v0"), (5L, "v0")).toDF("k", "v"), dir, Seq("k"))
    VersionedTable.commitWithStats(
      Seq((2L, "v1"), (6L, "v1")).toDF("k", "v"), dir, Seq("k"))
    assert(new java.io.File(s"$dir/manifest_v0").exists())
    assert(VersionedTable.expireVersions(spark, dir, keepLast = 1) == Seq(0L))
    // the orphan manifest would turn a read of the expired version into
    // a confusing missing-parquet error — it must go with the snapshot
    assert(!new java.io.File(s"$dir/manifest_v0").exists())
    assert(new java.io.File(s"$dir/manifest_v1").exists())
    // the surviving version's pruned read path is untouched
    val (pruned, read, total) = VersionedTable.readPruned(
      spark, dir, Map("k" -> ((1L, 3L))))
    // exact file accounting — v1 committed WITH stats, so this read
    // must be in pruning mode (total -1 would mean degraded) and its
    // total must be v1's real file count (an `|| total >= 1` escape
    // here would also rescue a manifest corrupted by the expire)
    assert(total == pruned.sparkSession.read
        .parquet(s"$dir/v1").inputFiles.length,
      s"pruning must account every v1 file, got total=$total read=$read")
    assert(pruned.count() == 1)
  }

  test("optimistic concurrency: of two interleaved committers exactly one wins, nothing clobbered") {
    val dir = tmp("graft_vt_occ")
    VersionedTable.commit(Seq((1L, "base")).toDF("k", "v"), dir)
    // the race, made deterministic through the commitExact seam: both
    // writers read currentVersion=0 and target next=1
    val winner = VersionedTable.commitExact(
      Seq((1L, "winner")).toDF("k", "v"), dir, 1L)
    assert(winner == 1L)
    val loser = intercept[ConcurrentCommitException] {
      VersionedTable.commitExact(Seq((1L, "loser")).toDF("k", "v"), dir, 1L)
    }
    assert(loser.getMessage.contains("v1"))
    // the winner's snapshot was NOT clobbered by the losing writer
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].head() == ((1L, "winner")))
    // the loser's staged snapshot was cleaned up — no stray .stage dirs
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".stage_")))
    // conflict is retryable: a plain re-commit lands on the next version
    val retried = VersionedTable.commit(Seq((1L, "loser")).toDF("k", "v"), dir)
    assert(retried == 2L)
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].head() == ((1L, "loser")))
    // and the pre-race history is intact (time travel)
    assert(VersionedTable.read(spark, dir, Some(0L))
      .as[(Long, String)].head() == ((1L, "base")))
  }

  test("commitMerge outlasts a rival landing between EVERY read and commit, then exhausts loudly") {
    // the deterministic face of the race-soak starvation find: the
    // derive callback ITSELF plays the rival, committing a version
    // after commitMerge's base read on each of its first 5 attempts —
    // every commitExact loses, and the 6th attempt (rival quiet)
    // must win with a base that carries EVERY rival row (re-derivation
    // against the fresh base, not a blind retry of the stale union)
    val dir = tmp("graft_vt_starve")
    VersionedTable.commit(Seq((1L, "base")).toDF("k", "v"), dir)
    var calls = 0
    VersionedTable.commitMerge(spark, dir, maxAttempts = 30) { base =>
      calls += 1
      if (calls <= 5)
        VersionedTable.commit(
          base.get.unionByName(Seq((100L + calls, "rival")).toDF("k", "v")),
          dir)
      base.get.unionByName(Seq((2L, "mine")).toDF("k", "v"))
    }
    assert(calls == 6, s"expected 5 lost races + the win, got $calls")
    val rows = VersionedTable.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(rows.contains((2L, "mine")))
    assert((1 to 5).forall(i => rows.contains((100L + i, "rival"))),
      s"a rival's append was erased: $rows")
    // budget exhaustion is LOUD, never a silent wrong commit: a rival
    // that never goes quiet must surface the conflict
    val ex = intercept[ConcurrentCommitException] {
      VersionedTable.commitMerge(spark, dir, maxAttempts = 3) { base =>
        VersionedTable.commit(base.get, dir)
        base.get
      }
    }
    assert(ex.getMessage.contains("concurrent"))
  }

  test("crashed claim wedges its version; clearClaim unwedges; published claims protected") {
    val dir = tmp("graft_vt_claim")
    VersionedTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir)
    // simulate a writer that died between claim and publish
    Files.createFile(Paths.get(dir, ".claim_v1"))
    intercept[ConcurrentCommitException] {
      VersionedTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir)
    }
    VersionedTable.clearClaim(spark, dir, 1L)
    assert(VersionedTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir) == 1L)
    // a PUBLISHED version's claim marker is load-bearing and protected
    intercept[IllegalArgumentException] {
      VersionedTable.clearClaim(spark, dir, 1L)
    }
  }

  test("version resolution is O(1): steady state never lists; summary self-heals") {
    val dir = tmp("graft_vt_summary")
    (0 until 5).foreach(i =>
      VersionedTable.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir))
    val before = VersionedTable.listingFallbackCount
    (0 until 3).foreach(_ =>
      assert(VersionedTable.versions(spark, dir) == (0L to 4L)))
    assert(VersionedTable.listingFallbackCount == before,
      "steady-state resolution after N commits must not list the directory")
    // a deleted summary heals itself: exactly one listing, then O(1) again
    Files.delete(Paths.get(dir, "_VERSIONS"))
    Files.deleteIfExists(Paths.get(dir, "._VERSIONS.crc"))
    assert(VersionedTable.versions(spark, dir) == (0L to 4L))
    val healed = VersionedTable.listingFallbackCount
    assert(healed == before + 1)
    assert(VersionedTable.versions(spark, dir) == (0L to 4L))
    assert(VersionedTable.listingFallbackCount == healed,
      "repair must restore the listing-free path")
    // a STALE summary (racing writer's rewrite landed late) is detected
    // against _CURRENT and repaired, never trusted
    clobber(dir, "_VERSIONS", "current=0\nversions=0\nmanifests=\n")
    assert(VersionedTable.versions(spark, dir) == (0L to 4L))
    assert(VersionedTable.listingFallbackCount == healed + 1)
  }

  test("expire keeps the summary consistent: post-expire resolution stays listing-free") {
    val dir = tmp("graft_vt_sumexp")
    (0 until 4).foreach(i =>
      VersionedTable.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir))
    assert(VersionedTable.expireVersions(spark, dir, keepLast = 2) == Seq(0L, 1L))
    val before = VersionedTable.listingFallbackCount
    assert(VersionedTable.versions(spark, dir) == Seq(2L, 3L))
    assert(VersionedTable.listingFallbackCount == before,
      "expire must leave a fresh summary, not force a listing")
  }

  test("a crash between publish and pointer swap is repaired by the next commit") {
    val dir = tmp("graft_vt_wedge")
    VersionedTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir)
    // simulate the dead writer: v1 snapshot + claim exist, but the
    // pointer never swapped — roll it back to v0
    clobber(dir, "_CURRENT", "v0")
    // without repair this state is permanently wedged: every commit
    // targets the already-claimed v1 and clearClaim refuses (published)
    val v = VersionedTable.commit(Seq((1L, "v2")).toDF("k", "v"), dir)
    assert(v == 2L, "repair must complete the dead writer's commit, then land after it")
    assert(VersionedTable.currentVersion(spark, dir).contains(2L))
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].head() == ((1L, "v2")))
    // the dead writer's snapshot survived as v1 (time travel reaches it)
    assert(VersionedTable.read(spark, dir, Some(1L))
      .as[(Long, String)].head() == ((1L, "v1")))
    assert(VersionedTable.versions(spark, dir) == Seq(0L, 1L, 2L))
    // deeper wedge: pointer rolled back TWO published versions — the
    // repair loop re-reads the pointer each iteration and walks it
    // forward one version at a time to the top, then commits past it
    clobber(dir, "_CURRENT", "v0")
    assert(VersionedTable.commit(Seq((1L, "v3")).toDF("k", "v"), dir) == 3L)
    assert(VersionedTable.currentVersion(spark, dir).contains(3L))
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].head() == ((1L, "v3")))
  }

  test("vacuumStaged removes only OLD orphaned stage dirs; fresh ones and live data survive") {
    val dir = tmp("graft_vt_vacuum")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), dir)
    // a crashed writer's orphan (old) and an in-flight writer's stage (fresh)
    val orphan = Paths.get(dir, ".stage_v1_deadbeef")
    Files.createDirectory(orphan)
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * 3600 * 1000L))
    val inflight = Paths.get(dir, ".stage_v1_00c0ffee")
    Files.createDirectory(inflight)
    val removed = VersionedTable.vacuumStaged(spark, dir)
    assert(removed.exists(_.endsWith(".stage_v1_deadbeef")) && removed.size == 1,
      s"exactly the old orphan goes, got $removed")
    assert(!Files.exists(orphan))
    assert(Files.exists(inflight), "an in-flight stage must never be vacuumed")
    // live table untouched, still committable
    assert(VersionedTable.read(spark, dir).count() == 1)
    assert(VersionedTable.commit(Seq((2L, "b")).toDF("k", "v"), dir) == 1L)
  }

  test("vacuumStaged treats a stage dir vanishing mid-scan as not-an-orphan") {
    val dir = tmp("graft_vt_vacrace")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), dir)
    // the guard itself: a path that disappeared between the listing
    // and the recursive mtime walk (publish renamed it to v<N>) must
    // read as None, never throw — pre-fix this FileNotFound crashed
    // the whole vacuum run
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(VersionedTable.stagedNewestMtime(
      f, new org.apache.hadoop.fs.Path(dir, ".stage_v9_vanished")).isEmpty)
    // and an intact old orphan still vacuums through the same path
    val orphan = Paths.get(dir, ".stage_v2_dead")
    Files.createDirectory(orphan)
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * 3600 * 1000L))
    assert(VersionedTable.vacuumStaged(spark, dir)
      .exists(_.endsWith(".stage_v2_dead")))
  }

  test("readPruned finds an on-disk manifest the fresh summary failed to register") {
    val dir = tmp("graft_vt_possum")
    VersionedTable.commitWithStats(
      spark.range(0, 100).toDF("k").withColumn("v", col("k") * 2)
        .repartition(4), dir, Seq("k"))
    // simulate commitWithStats's skipped-registration window: a crash
    // (or concurrent commit) between manifest write and summary
    // registration leaves a FRESH summary whose manifests list omits
    // v0 — the summary must act as a positive cache only, not
    // permanently condemn v0 to unpruned full reads
    clobber(dir, "_VERSIONS", "current=0\nversions=0\nmanifests=\n")
    val (pruned, read, total) = VersionedTable.readPruned(
      spark, dir, Map("k" -> ((0L, 9L))))
    assert(read != -1,
      "the on-disk manifest must be probed when the fresh summary omits it")
    assert(total >= 1 && read <= total)
    assert(pruned.count() == 10)
  }

  test("schema enforcement: drops/type changes reject; additions need the evolution opt-in") {
    val dir = tmp("graft_vt_schema")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), dir)
    // type change: always rejected
    intercept[SchemaMismatchException] {
      VersionedTable.commit(Seq((1L, 2L)).toDF("k", "v"), dir)
    }
    // dropped column: always rejected
    intercept[SchemaMismatchException] {
      VersionedTable.commit(Seq(Tuple1(1L)).toDF("k"), dir)
    }
    // added column: rejected by default...
    intercept[SchemaMismatchException] {
      VersionedTable.commit(Seq((1L, "a", 9L)).toDF("k", "v", "extra"), dir)
    }
    // ...accepted with the explicit opt-in; nothing above committed
    assert(VersionedTable.versions(spark, dir) == Seq(0L))
    val v = VersionedTable.commit(
      Seq((1L, "a", 9L)).toDF("k", "v", "extra"), dir, allowEvolution = true)
    assert(v == 1L)
    // a rejected commit stages nothing and claims nothing: the next
    // version number was NOT consumed by the failures above
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".stage_")))
    // same-schema commits (the steady state) still flow with defaults
    assert(VersionedTable.commit(
      Seq((2L, "b", 1L)).toDF("k", "v", "extra"), dir) == 2L)
  }

  test("commitRetrying rides over a stale claim cleared mid-flight") {
    val dir = tmp("graft_vt_retry")
    VersionedTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir)
    // another committer wins v1 between our read and our claim: plain
    // commit throws, commitRetrying re-reads and lands on v2
    val racer = Seq((1L, "racer")).toDF("k", "v")
    VersionedTable.commitExact(racer, dir, 1L)
    // stale pointer scenario: commitRetrying's first attempt reads the
    // CURRENT pointer (already 1), so it simply wins v2; the conflict
    // path is covered by forcing the claim to exist first
    Files.createFile(Paths.get(dir, ".claim_v2"))
    val t = new Thread(() => {
      Thread.sleep(250)
      VersionedTable.clearClaim(spark, dir, 2L)
    })
    t.start()
    // early attempts hit the orphan claim and conflict; the backoff
    // outlasts the clearer thread and the commit lands on v2
    val v = VersionedTable.commitRetrying(
      Seq((1L, "mine")).toDF("k", "v"), dir, maxAttempts = 10)
    t.join()
    assert(v == 2L, s"expected to land on v2 after retries, got $v")
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].head() == ((1L, "mine")))
  }

  test("deleteWhere removes only TRUE rows; NULL predicate rows survive") {
    val dir = Files.createTempDirectory("vt_del").toString
    VersionedTable.commit(
      Seq((1L, Some(1)), (2L, Some(2)), (3L, None))
        .toDF("k", "v"), dir)
    // v > 1: TRUE for k=2, FALSE for k=1, NULL for k=3 — SQL DELETE
    // removes only the TRUE row
    val ver = VersionedTable.deleteWhere(spark, dir, col("v") > 1)
    assert(ver == 1L)
    assert(VersionedTable.read(spark, dir)
      .select($"k").as[Long].collect().toSet == Set(1L, 3L))
    graft.util.Fs.deleteRecursively(dir)
  }

  test("updateWhere assigns only TRUE rows and versions the change") {
    val dir = Files.createTempDirectory("vt_upd").toString
    VersionedTable.commit(
      Seq((1L, Some(1), "a"), (2L, Some(2), "b"), (3L, None, "c"))
        .toDF("k", "v", "s"), dir)
    VersionedTable.updateWhere(spark, dir, col("v") > 1,
      Map("s" -> lit("X"), "v" -> (col("v") + 10)))
    assert(VersionedTable.read(spark, dir)
      .orderBy($"k").as[(Long, Option[Int], String)].collect().toSeq ==
      Seq((1L, Some(1), "a"), (2L, Some(12), "X"), (3L, None, "c")))
    // time travel still serves the pre-update state
    assert(VersionedTable.read(spark, dir, Some(0L))
      .filter($"k" === 2L).as[(Long, Option[Int], String)].head() ==
      ((2L, Some(2), "b")))
    graft.util.Fs.deleteRecursively(dir)
  }

  test("readChangesSince hands an incremental consumer its next cursor") {
    val dir = Files.createTempDirectory("vt_inc").toString
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "s"), dir)
    // bootstrap: everything reads as inserts
    val (boot, c0) = VersionedTable.readChangesSince(spark, dir, -1L, Seq("k"))
    assert(c0 == 0L && boot.select($"k", $"_change_type")
      .as[(Long, String)].collect().toSeq == Seq((1L, "insert")))
    // caught up: empty window, cursor unchanged
    val (idle, c1) = VersionedTable.readChangesSince(spark, dir, c0, Seq("k"))
    assert(c1 == 0L && idle.count() == 0)
    // two more commits; one catch-up read spans both
    VersionedTable.commit(Seq((1L, "a2"), (2L, "b")).toDF("k", "s"), dir)
    VersionedTable.commit(Seq((2L, "b")).toDF("k", "s"), dir)
    val (win, c2) = VersionedTable.readChangesSince(spark, dir, c0, Seq("k"))
    assert(c2 == 2L)
    val got = win.select($"k", $"s", $"_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a", "delete"), (2L, "b", "insert")),
      s"net change across the window: $got")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("commitUnique rejects duplicate keys before staging anything") {
    val dir = Files.createTempDirectory("vt_uniq").toString
    VersionedTable.commitUnique(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir, Seq("k"))
    val ex = intercept[IllegalArgumentException] {
      VersionedTable.commitUnique(
        Seq((1L, "x"), (1L, "y")).toDF("k", "s"), dir, Seq("k"))
    }
    assert(ex.getMessage.contains("duplicate keys"))
    assert(VersionedTable.currentVersion(spark, dir).contains(0L),
      "rejected commit must leave the table at v0")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("shredding: declaration is the evolution opt-in; DML re-extracts from the updated source") {
    val dir = tmp("graft_vt_shred")
    val base = Seq(
      (1L, """{"k": 5, "s": "a"}"""),
      (2L, """{"k": 7, "s": "b"}""")).toDF("id", "props")
    VersionedTable.commit(base, dir)
    // declare AFTER the table exists: the next commit materializes the
    // typed columns without any caller passing allowEvolution — the
    // declaration itself is the recorded opt-in
    VersionedTable.setShreddedPaths(spark, dir,
      Seq("props|k_shred:$.k:int", "props|s_shred:$.s:string"))
    VersionedTable.commit(VersionedTable.read(spark, dir)
      .select($"id", $"props"), dir)
    val v1 = VersionedTable.read(spark, dir)
    assert(v1.schema("k_shred").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(v1.select($"id", $"k_shred", $"s_shred")
      .as[(Long, Int, String)].collect().toSet ==
      Set((1L, 5, "a"), (2L, 7, "b")))
    // re-commit of the read-back snapshot (shredded columns present):
    // re-extraction is deterministic, so the snapshot is unchanged
    VersionedTable.commit(VersionedTable.read(spark, dir), dir)
    assert(VersionedTable.read(spark, dir)
      .select($"id", $"k_shred").as[(Long, Int)].collect().toSet ==
      Set((1L, 5), (2L, 7)))
    // UPDATE the SOURCE column: the commit must RE-extract — the
    // read-back frame carries the stale pre-update k_shred=5, and
    // committing that value would silently diverge from props
    VersionedTable.updateWhere(spark, dir, $"id" === 1L,
      Map("props" -> lit("""{"k": 99, "s": "z"}""")))
    val v3 = VersionedTable.read(spark, dir)
    assert(v3.filter($"id" === 1L).select($"k_shred", $"s_shred")
      .as[(Int, String)].head() == ((99, "z")),
      "shredded columns must track the updated source")
    assert(v3.filter($"id" === 2L).select($"k_shred").as[Int].head() == 7)
    // the opt-in is scoped to DECLARED outputs: an undeclared new
    // column still needs allowEvolution
    intercept[SchemaMismatchException] {
      VersionedTable.commit(v3.withColumn("extra", lit(1)), dir)
    }
    graft.util.Fs.deleteRecursively(dir)
  }

  test("shredding: re-declaring a path's type re-materializes the column instead of wedging commits") {
    val dir = tmp("graft_vt_shred3")
    VersionedTable.setShreddedPaths(spark, dir, Seq("props|k_shred:$.k:int"))
    VersionedTable.commit(Seq((1L, """{"k": 5}""")).toDF("id", "props"), dir)
    assert(VersionedTable.read(spark, dir).schema("k_shred").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // admin re-declares the path at LONG: the derived column's shape
    // is the declaration's to change, so the next commit — a DML
    // here, the path that cannot avoid the auto re-extraction —
    // re-materializes at the new type rather than rejecting as a
    // "type change" forever (the wedge the enforcement exemption
    // prevents)
    VersionedTable.setShreddedPaths(spark, dir, Seq("props|k_shred:$.k:long"))
    VersionedTable.updateWhere(spark, dir, lit(true),
      Map("props" -> lit("""{"k": 6}""")))
    val out = VersionedTable.read(spark, dir)
    assert(out.schema("k_shred").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.select($"k_shred").as[Long].head() == 6L)
    // undeclared columns keep full type-change protection
    intercept[SchemaMismatchException] {
      VersionedTable.commit(out.withColumn("id", col("id").cast("int")), dir)
    }
    graft.util.Fs.deleteRecursively(dir)
  }

  test("shredding: a declaration colliding with a real column is rejected at declare time") {
    val dir = tmp("graft_vt_shred4")
    VersionedTable.commit(
      Seq((1L, """{"k": 1}""", 9)).toDF("id", "props", "k_shred"), dir)
    // the commit path exempts declared outputs from schema
    // enforcement (derived columns), so a declaration whose output
    // name collides with a REAL column would make the next commit
    // silently overwrite real data — the declaration itself must
    // reject instead
    val e = intercept[IllegalArgumentException] {
      VersionedTable.setShreddedPaths(spark, dir,
        Seq("props|k_shred:$.k:int"))
    }
    assert(e.getMessage.contains("k_shred"), e.getMessage)
    // nothing was declared: later commits leave the real column alone
    VersionedTable.commit(VersionedTable.read(spark, dir), dir)
    assert(VersionedTable.read(spark, dir)
      .select($"k_shred").as[Int].head() == 9)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("shredding: missing source skips; a hand-edited bad sidecar drops, never wedges") {
    val dir = tmp("graft_vt_shred2")
    // a HAND-EDITED sidecar (not the API — setShreddedPaths rejects
    // malformed declarations at declare time, below) must not wedge
    // every future commit: the commit-time parse silently drops what
    // it cannot use
    VersionedTable.atomicWrite(spark, dir, "_SHRED_PATHS", Seq(
      "props|k_shred:$.k:int", // valid
      "absent|a_shred:$.a:int", // source column missing -> skipped
      "no-pipe-separator", // structurally malformed -> dropped
      "props|bad:$.k:notatype", // unparseable SQL type -> dropped
      "props|worse:$.k with:colons:int" // ':' in path shifts the
      // split so tpe reads "colons:int" -> unparseable -> dropped
    ).mkString(","))
    val df = Seq((1L, """{"k": 3}""")).toDF("id", "props")
    VersionedTable.commit(df, dir) // a bad sidecar must not wedge commits
    val out = VersionedTable.read(spark, dir)
    assert(out.columns.toSet == Set("id", "props", "k_shred"),
      s"only the valid declaration extracts: ${out.columns.mkString(",")}")
    assert(out.select($"k_shred").as[Int].head() == 3)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("shredding: the declare API rejects malformed declarations instead of dropping them silently") {
    val dir = tmp("graft_vt_shred5")
    // an API caller is present to see the error — accepting a typo'd
    // declaration that every commit then drops would mean the column
    // never materializes with no error anywhere
    for (bad <- Seq("no-pipe-separator", "props|bad:$.k:notatype",
        "props|worse:$.k with:colons:int")) {
      val e = intercept[IllegalArgumentException] {
        VersionedTable.setShreddedPaths(spark, dir,
          Seq("props|k_shred:$.k:int", bad))
      }
      assert(e.getMessage.contains("malformed"), e.getMessage)
    }
    // nothing was declared by the rejected calls
    VersionedTable.commit(Seq((1L, """{"k": 3}""")).toDF("id", "props"), dir)
    assert(VersionedTable.read(spark, dir).columns.toSet ==
      Set("id", "props"))
    graft.util.Fs.deleteRecursively(dir)
  }

  test("shredding: UPDATE of a derived output column is rejected, not silently reverted") {
    val dir = tmp("graft_vt_shred6")
    VersionedTable.setShreddedPaths(spark, dir, Seq("props|k_shred:$.k:int"))
    VersionedTable.commit(Seq((1L, """{"k": 5}""")).toDF("id", "props"), dir)
    // the commit path recomputes k_shred from props on EVERY commit,
    // so a direct SET k_shred=... would appear to succeed and then be
    // reverted by re-extraction at the same commit — reject up front
    val e = intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, dir, $"id" === 1L,
        Map("k_shred" -> lit(42)))
    }
    assert(e.getMessage.contains("k_shred"), e.getMessage)
    assert(VersionedTable.currentVersion(spark, dir).contains(0L),
      "rejected UPDATE must not commit")
    // updating the SOURCE remains the supported path
    VersionedTable.updateWhere(spark, dir, $"id" === 1L,
      Map("props" -> lit("""{"k": 42}""")))
    assert(VersionedTable.read(spark, dir)
      .select($"k_shred").as[Int].head() == 42)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("shredOutputFor: hits only when declared AND materialized at the asked type") {
    val dir = tmp("graft_vt_shred7")
    VersionedTable.setShreddedPaths(spark, dir, Seq("props|k_shred:$.k:int"))
    // declared but nothing committed yet -> no snapshot column -> miss
    assert(VersionedTable.shredOutputFor(spark, dir, "props", "$.k", "int").isEmpty)
    VersionedTable.commit(Seq((1L, """{"k": 5}""")).toDF("id", "props"), dir)
    assert(VersionedTable.shredOutputFor(spark, dir, "props", "$.k", "int")
      .contains("k_shred"))
    // a different path, source column, or type must miss — serving a
    // typed column for a query it does not cover would be wrong data
    assert(VersionedTable.shredOutputFor(spark, dir, "props", "$.j", "int").isEmpty)
    assert(VersionedTable.shredOutputFor(spark, dir, "other", "$.k", "int").isEmpty)
    assert(VersionedTable.shredOutputFor(spark, dir, "props", "$.k", "long").isEmpty)
    graft.util.Fs.deleteRecursively(dir)
  }

  test("readPartitionPruned: lists only surviving directories, matches the filtered read, empty selection keeps schema") {
    val dir = tmp("graft_vt_ppr")
    VersionedTable.setPartitionColumns(spark, dir, Seq("bucket"))
    VersionedTable.commit(
      (0 until 40).map(i => (i.toLong, i % 8, s"r$i"))
        .toDF("id", "bucket", "payload"), dir)
    val pruned = VersionedTable.readPartitionPruned(spark, dir,
      "bucket", v => v.toInt >= 6)
    // row equality against the plain filtered read
    val expected = VersionedTable.read(spark, dir)
      .filter($"bucket" >= 6)
      .select($"id", $"payload", $"bucket")
      .as[(Long, String, Int)].collect().sorted.toSeq
    assert(pruned.select($"id", $"payload", $"bucket")
      .as[(Long, String, Int)].collect().sorted.toSeq == expected)
    // runtime containment: only surviving dirs are ever opened
    val files = pruned.select(input_file_name().as("f"))
      .distinct().as[String].collect()
    assert(files.nonEmpty &&
      files.forall(f => f.contains("bucket=6") || f.contains("bucket=7")),
      s"pruned read must touch only surviving dirs: ${files.take(3).mkString(",")}")
    // empty selection: full schema, zero rows, no crash
    val none = VersionedTable.readPartitionPruned(spark, dir,
      "bucket", _ => false)
    assert(none.columns.toSet == Set("id", "bucket", "payload"))
    assert(none.count() == 0)
    // pinned-version read routes through the same pruning
    VersionedTable.commit(
      Seq((100L, 6, "new")).toDF("id", "bucket", "payload"), dir)
    val pinned = VersionedTable.readPartitionPruned(spark, dir,
      "bucket", v => v.toInt == 6, version = Some(0L))
    assert(!pinned.select($"id").as[Long].collect().contains(100L),
      "a pinned pruned read must serve the pinned snapshot")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("readPartitionPruned: escaped string values unescape before keep, null partitions gated by keepNull") {
    val dir = tmp("graft_vt_ppe")
    VersionedTable.setPartitionColumns(spark, dir, Seq("region"))
    // values the writer must Hive-escape in directory names (space,
    // colon, slash) plus a NULL (the __HIVE_DEFAULT_PARTITION__ dir)
    VersionedTable.commit(
      Seq((1L, "north america"), (2L, "a:b"), (3L, "x/y"),
        (4L, null.asInstanceOf[String]), (5L, "plain"))
        .toDF("id", "region"), dir)
    // the predicate speaks LOGICAL values — escaping is invisible
    val got = VersionedTable.readPartitionPruned(spark, dir,
      "region", v => v == "north america" || v == "a:b" || v == "x/y")
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L),
      s"escaped partition values must match their logical form: $got")
    // null partition: excluded by default, included via keepNull
    val noNull = VersionedTable.readPartitionPruned(spark, dir,
      "region", _ => false)
      .select($"id").as[Long].collect().toSet
    assert(noNull == Set.empty[Long])
    val withNull = VersionedTable.readPartitionPruned(spark, dir,
      "region", _ => false, keepNull = true)
      .select($"id").as[Long].collect().toSet
    assert(withNull == Set(4L),
      s"keepNull must select exactly the hive default partition: $withNull")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("readPartitionPruned: a legacy dir value with '%' + sign-prefixed hex passes through verbatim") {
    // Integer.parseInt accepts a leading sign, so "%+B" naively
    // decodes to U+000B and the partition silently vanishes from
    // every pruned read — the contract says malformed escapes pass
    // through verbatim. Legacy (unescaped-writer) layouts are the
    // only way such a name arises: Spark's own writer escapes '%'.
    val dir = tmp("graft_vt_ppl")
    VersionedTable.setPartitionColumns(spark, dir, Seq("tag"))
    VersionedTable.commit(Seq((1L, "base")).toDF("id", "tag"), dir)
    // graft a legacy-style partition dir beside the written one
    val snap = new java.io.File(s"$dir/v0")
    val legacy = new java.io.File(snap, "tag=A%+Bfoo")
    val src = snap.listFiles().find(_.getName.startsWith("tag=")).get
    assert(legacy.mkdir())
    src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(legacy, f.getName).toPath)
    }
    val pruned = VersionedTable.readPartitionPruned(spark, dir,
      "tag", v => v == "A%+Bfoo")
    // the keep predicate saw the verbatim name (else zero dirs match);
    // containment proves only the legacy dir was opened
    val files = pruned.select(input_file_name().as("f"))
      .distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("Bfoo")),
      s"sign-prefixed pseudo-escape must select the legacy dir: ${files.toSeq}")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("changesBetween emits insert/delete/update images and skips unchanged rows") {
    val dir = Files.createTempDirectory("vt_cdf").toString
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), dir)
    VersionedTable.commit(
      Seq((2L, "B2"), (3L, "c"), (4L, "d")).toDF("k", "s"), dir)
    val got = VersionedTable.changesBetween(spark, dir, 0L, 1L, Seq("k"))
      .select($"k", $"s", $"_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "a", "delete"),
      (2L, "b", "update_preimage"), (2L, "B2", "update_postimage"),
      (4L, "d", "insert")),
      s"k=3 unchanged must emit nothing: $got")
    graft.util.Fs.deleteRecursively(dir)
  }
}
