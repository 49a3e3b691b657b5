package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** End-to-end streaming pipeline tests: real file sources, real
  * checkpoints, Trigger.AvailableNow (the test-time face of the 60 s
  * ProcessingTime micro-batch). Fixtures follow FIXTURES.md §A.1 edge
  * cases: null callsign, 17- vs 18-element arrays, duplicate icao24,
  * case/whitespace-variant join keys, keys missing from the dim. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Two aircraft; AB1 appears twice (dedup target), second array has
    * only 17 elements (no category). Mixed-case icao24 tests key
    * normalization. */
  private val stateLines = Seq(
    """["AB1", "CALL1  ", "France", 1700000000, 1700000100, 2.1, 48.8, 10000.0, false, 250.0, 90.0, 1.5, null, 10100.0, "7700", false, 0, 3]""",
    """["ab1", "CALL1  ", "France", 1700000050, 1700000150, 2.2, 48.9, 10050.0, false, 251.0, 91.0, 1.4, null, 10150.0, "7700", false, 0, 3]""",
    """["CD2", null, "Germany", 1700000000, 1700000100, 13.4, 52.5, 9000.0, true, 0.0, 0.0, 0.0, null, 9100.0, "1200", true, 1]""")

  test("ingest pipeline: parse, normalize, dedup, parquet sink") {
    val src = tmp("graft_bronze_src")
    Files.writeString(Paths.get(src, "raw_1.jsonl"),
      stateLines.mkString("\n"))
    val out = tmp("graft_ingest_out")
    val ckpt = tmp("graft_ingest_ckpt")

    val q = Pipelines.runIngest(
      Pipelines.bronzeSource(spark, src), out, ckpt)
    q.awaitTermination()

    val got = spark.read.parquet(out)
    // dedup keeps one row per icao24 (first within watermark)
    assert(got.count() == 2)
    val byKey = got.select($"icao24", $"callsign", $"category")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byKey.keySet == Set("ab1", "cd2"))
    assert(byKey("ab1").getString(1) == "CALL1") // trimmed
    assert(byKey("cd2").isNullAt(1)) // null callsign preserved
    assert(byKey("cd2").isNullAt(2)) // 17-element array: category null
  }

  test("quarantine ingest: good rows survive, bad lines quarantined with a reason") {
    val src = tmp("graft_quar_src")
    val out = tmp("graft_quar_out")
    val quar = tmp("graft_quar_bad")
    val ckpt = tmp("graft_quar_ckpt")
    // 2 good lines + garbage + truncated JSON + a JSON object +
    // a short (16-element) array + a wrong-type longitude
    Files.writeString(Paths.get(src, "raw_1.jsonl"), Seq(
      stateLines.head,
      stateLines(2),
      "total garbage !!",
      """["AB1", "CALL1", "France", 1700000000""",
      """{"icao24": "AB1"}""",
      """["EF3", "C3", "Spain", 1700000000, 1700000100, 2.0, 40.0, 100.0, false, 10.0, 5.0, 0.1, null, 110.0, "1000", false]""",
      """["GH4", "C4", "Italy", 1700000000, 1700000100, "EAST", 41.0, 100.0, false, 10.0, 5.0, 0.1, null, 110.0, "1000", false, 0]""")
      .mkString("\n"))

    Pipelines.runIngestQuarantine(
      Pipelines.bronzeSource(spark, src), out, quar, ckpt)
      .awaitTermination()

    val good = spark.read.parquet(out)
    assert(good.count() == 2)
    assert(good.select($"icao24").as[String].collect().toSet == Set("ab1", "cd2"))
    // good rows parse fully typed (no silently-nulled numerics)
    assert(good.filter($"longitude".isNull).count() == 0)

    val bad = spark.read.parquet(quar)
      .select($"raw", $"reason").as[(String, String)].collect()
    assert(bad.length == 5)
    val reasons = bad.map { case (raw, reason) => reason -> raw }.toMap
    assert(bad.count(_._2 == "not_json_array") == 3) // garbage, truncated, object
    assert(reasons("short_array").startsWith("""["EF3""""))
    assert(reasons("type_mismatch").startsWith("""["GH4"""")) // "EAST" longitude
  }

  test("silver pipeline: broadcast enrichment with Unknown fill") {
    val src = tmp("graft_bronze2_src")
    Files.writeString(Paths.get(src, "raw_1.jsonl"),
      stateLines.mkString("\n"))
    val out = tmp("graft_silver_out")
    val ckpt = tmp("graft_silver_ckpt")

    // dim with case/whitespace-variant key; CD2 missing from dim
    val dim = Seq((" AB1 ", "A320", "AirX"))
      .toDF("icao24", "model", "operator")

    val q = Pipelines.runSilver(
      Pipelines.bronzeSource(spark, src), dim, out, ckpt)
    q.awaitTermination()

    val got = spark.read.parquet(out)
    assert(got.count() == 3) // silver enriches all rows, no dedup
    val models = got.select($"icao24", $"model").as[(String, String)]
      .collect().toMap
    assert(models("ab1") == "A320") // normalized key matched
    assert(models("cd2") == "Unknown") // unmatched -> filled
  }

  test("enrich picks a deterministic first-match on conflicting duplicate dim keys") {
    import org.apache.spark.sql.functions.col
    val states = Seq(("ab1", 1L)).toDF("icao24", "last_contact")
    // two dim rows normalize to the SAME key with different attributes
    // — dropDuplicates kept an arbitrary one (partition-scan order);
    // the lexicographic-minimum tuple is the stable pick
    val dim = Seq(("AB1", "B737", "Zeta"), ("ab1 ", "A320", "AirX"))
      .toDF("icao24", "model", "operator")
    val a = Pipelines.enrich(states, dim)
      .select(col("model"), col("operator")).head()
    assert(a.getString(0) == "A320" && a.getString(1) == "AirX",
      s"expected the lexicographic minimum attribute tuple, got $a")
    // and the pick is layout-independent
    val b = Pipelines.enrich(states, dim.repartition(7))
      .select(col("model"), col("operator")).head()
    assert(b == a, "enrichment must not depend on dim partitioning")
  }

  test("refresh sink: a fresh checkpoint lineage is not swallowed by the dead lineage's marker") {
    val serving = tmp("graft_refresh_lineage")
    // old lineage got to epoch 7
    Pipelines.refreshBatch(Seq((1L, "a")).toDF("k", "v"), 7L, "k",
      serving, "w1")
    // a NEW lineage (fresh checkpoint) restarts epochs at 0 — with the
    // unscoped marker this was a silent no-op and every batch vanished
    Pipelines.refreshBatch(Seq((2L, "b")).toDF("k", "v"), 0L, "k",
      serving, "w2")
    val got = graft.engine.VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")),
      s"new lineage's batch must land: $got")
  }

  test("refresh sink: the legacy unscoped marker is never honored — a fresh lineage's batch always lands") {
    val serving = tmp("graft_refresh_legacy")
    // a PRE-UPGRADE serving dir: committed data + the unscoped
    // high-water marker. The marker carries no lineage identity, so a
    // skip rule cannot tell a replayed pre-upgrade batch from a FRESH
    // checkpoint's first batch at the same epoch id — and skipping
    // the latter loses its content forever. refreshBatch therefore
    // ignores the legacy marker outright: the worst case is one
    // duplicate-content version on a true replay, which the
    // key-idempotent upsert converges.
    graft.engine.VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), serving)
    graft.engine.VersionedTable.atomicWrite(spark, serving,
      "_LAST_EPOCH", "7")
    // a true replay of the pre-upgrade lineage's last batch: applies,
    // commits one spurious version — but the CONTENT converges (the
    // rows were already upserted pre-upgrade)
    Pipelines.refreshBatch(Seq((2L, "b")).toDF("k", "v"), 7L, "k",
      serving, "w1")
    assert(graft.engine.VersionedTable.currentVersion(spark, serving)
      .contains(1L), "replay applies (one extra version, by design)")
    assert(graft.engine.VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")),
      "replayed content must converge, not duplicate")
    // a FRESH lineage's first batch at an epoch the dead marker would
    // have swallowed (0 < 7) must land — this is the data-loss edge
    // that rules out honoring the legacy marker
    Pipelines.refreshBatch(Seq((3L, "c")).toDF("k", "v"), 0L, "k",
      serving, "w2")
    assert(graft.engine.VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")),
      "fresh lineage's batch must never be swallowed")
    // from here the scoped marker owns replay-skipping as usual
    assert(Pipelines.lastEpoch(spark, serving, "_LAST_EPOCH_w2")
      .contains(0L))
    Pipelines.refreshBatch(Seq((4L, "d")).toDF("k", "v"), 0L, "k",
      serving, "w2")
    assert(graft.engine.VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")),
      "scoped replay skips")
  }

  test("streaming tumbling window matches batch date_trunc grouping") {
    val src = tmp("graft_ev_src")
    val batch = graft.engine.Tables(spark, sfSmoke, "events")
    batch.write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(src)
    val q = Pipelines.tumblingCounts(stream)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("tumbling_out")
      .orderBy($"window_start", $"event_type").collect()
    val batched = graft.ops.StreamingOps.streamTumbling(spark, sfSmoke).collect()
    // append mode only emits windows below the watermark; every emitted
    // window must match the batch computation exactly
    val batchMap = batched.map(r => (r.get(0), r.get(1)) -> r).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      val key = (r.get(0), r.get(1))
      assert(batchMap.contains(key), s"window $key missing from batch")
      assert(batchMap(key).get(2) == r.get(2), s"cnt mismatch at $key")
      assert(batchMap(key).get(3) == r.get(3), s"sum mismatch at $key")
    }
    // COMPLETENESS, not just soundness: the per-row loop above passes
    // even if a watermark regression emits 1 of N closed windows. The
    // set that MUST have emitted is derivable — every window strictly
    // closed under the final watermark (max ts - the 2h delay; strict
    // < dodges the emit-boundary tie). 1-hour windows: end = start+1h.
    val maxTs = batch.agg(max($"ts")).head().getTimestamp(0).getTime
    val wmMs = maxTs - 2L * 3600 * 1000
    val mustEmit = batched.filter(r =>
        r.getTimestamp(0).getTime + 3600 * 1000 < wmMs)
      .map(r => (r.get(0), r.get(1))).toSet
    val emitted = streamed.map(r => (r.get(0), r.get(1))).toSet
    assert(mustEmit.nonEmpty, "fixture must close windows under the watermark")
    assert(mustEmit.subsetOf(emitted),
      s"closed windows never emitted: ${(mustEmit -- emitted).take(5)}")
  }

  test("stream-stream interval join matches the batch face exactly") {
    val src = tmp("graft_ssj_src")
    val batch = graft.engine.Tables(spark, sfSmoke, "events")
    batch.write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(batch.schema).parquet(src)
    val q = Pipelines.clickAttribution(stream)
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // inner stream-stream joins emit eagerly on match (the watermark
    // only bounds buffered state), so the streamed result must equal
    // the batch run of the SAME code path row-for-row
    val streamed = spark.table("ssj_out").collect()
      .map(_.toSeq).toSet
    val batched = graft.ops.StreamingOps.streamJoin(spark, sfSmoke).collect()
      .map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batched,
      s"stream/batch divergence: ${(streamed diff batched).take(3)} / ${(batched diff streamed).take(3)}")
  }

  test("stateful dedup emits only strictly-newer last_contact per key") {
    val src = tmp("graft_state_src")
    val out = tmp("graft_state_out")
    val ckpt = tmp("graft_state_ckpt")
    def run(): Unit = {
      val stream = spark.readStream
        .schema("k STRING, lc LONG, v DOUBLE")
        .json(src)
        .as[(String, Long, Double)]
      // AvailableNow: drain pending files then stop (a ProcessingTime
      // timeout would otherwise keep scheduling empty timeout batches)
      val q = Pipelines.dedupLatestStateful(stream)
        .toDF("k", "lc", "v")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Files.writeString(Paths.get(src, "b1.json"),
      """{"k":"a","lc":100,"v":1.0}
        |{"k":"a","lc":90,"v":2.0}
        |{"k":"b","lc":50,"v":3.0}""".stripMargin)
    run()
    // within one batch, in-order processing: 90 then 100 both emit
    val batch1 = spark.read.parquet(out).collect()
    assert(batch1.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 90L), ("a", 100L), ("b", 50L)))

    Files.writeString(Paths.get(src, "b2.json"),
      """{"k":"a","lc":95,"v":4.0}
        |{"k":"a","lc":110,"v":5.0}
        |{"k":"b","lc":50,"v":6.0}""".stripMargin)
    run()
    val all = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // state survived the restart via the checkpoint: 95 < stored 100 ->
    // suppressed; duplicate (b,50) -> suppressed; 110 -> emitted
    assert(all == Set(("a", 90L), ("a", 100L), ("a", 110L), ("b", 50L)))
  }

  test("rest poller lands atomic batches the incremental ingest picks up exactly once") {
    val src = tmp("graft_rest_src")
    val out = tmp("graft_rest_out")
    val ckpt = tmp("graft_rest_ckpt")

    // poll 1: two aircraft (fake fetcher = the reference's REST payload
    // shape); empty poll produces NO file
    assert(RestPoller.pollOnce(() => Seq.empty, src, 0L).isEmpty)
    val f1 = RestPoller.pollOnce(() => Seq(stateLines.head, stateLines(2)), src, 1L)
    assert(f1.exists(_.getFileName.toString == "rest_batch_1.jsonl"))
    // no temp droppings left behind
    assert(!Files.list(Paths.get(src)).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".tmp")))

    Pipelines.runIngest(Pipelines.bronzeSource(spark, src), out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() == 2)

    // poll 2 via the loop: only the NEW batch is ingested on restart
    // (a re-polled ab1 would be suppressed by the checkpointed dedup
    // state — correct, it IS a dedup — so poll a new aircraft)
    val newLine =
      """["EF5", "C5", "Spain", 1700000200, 1700000300, 2.0, 40.0, 100.0, false, 10.0, 5.0, 0.1, null, 110.0, "1000", false, 0]"""
    RestPoller.pollLoop(() => Seq(newLine), src, intervalMs = 0, maxBatches = 1, firstBatchId = 2L)
    Pipelines.runIngest(Pipelines.bronzeSource(spark, src), out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() == 3)
  }

  test("checkpoint makes ingest incremental: new files only") {
    val src = tmp("graft_incr_src")
    Files.writeString(Paths.get(src, "raw_1.jsonl"), stateLines.head)
    val out = tmp("graft_incr_out")
    val ckpt = tmp("graft_incr_ckpt")

    Pipelines.runIngest(Pipelines.bronzeSource(spark, src), out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() == 1)

    // second batch: only the new file is processed (offsets in ckpt);
    // the same icao24 reappears and is kept (state does not survive
    // across AvailableNow restarts — watermark TTL analog)
    Files.writeString(Paths.get(src, "raw_2.jsonl"), stateLines(2))
    Pipelines.runIngest(Pipelines.bronzeSource(spark, src), out, ckpt)
      .awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() == 2)
    assert(got.select($"icao24").distinct().count() == 2)
  }

  test("streaming incremental dedup: snapshot near-dups dropped, novel docs land and extend the snapshot") {
    val src = tmp("graft_sid_src")
    val snap = tmp("graft_sid_snap")
    val out = tmp("graft_sid_out")
    val ckpt = tmp("graft_sid_ckpt")

    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten"
    val textC = "red orange yellow green blue indigo violet black white gray"
    val textD = "north south east west up down left right front back"

    // yesterday's corpus: docs 1 (textA) and 2 (textB), signatures
    // persisted as a VersionedTable — the snapshot the stream gates on
    // seed WITHOUT the (writer, epoch) txn columns — the batch-op /
    // pre-upgrade snapshot shape; the gate must migrate it in place
    val oldDocs = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    graft.engine.VersionedTable.commit(
      graft.ops.Llm.mapOnlyBandedSignatures(graft.ops.Llm.shingleDocs(oldDocs)),
      snap)

    def docStream = spark.readStream
      .schema("doc_id LONG, text STRING")
      // each landed batch is its own subdir of part-files
      .option("recursiveFileLookup", "true")
      .parquet(src)

    // batch 1: doc 10 duplicates textA (every band key collides),
    // doc 11 is novel
    Seq((10L, textA), (11L, textC)).toDF("doc_id", "text")
      .write.parquet(s"$src/b1")
    Pipelines.runStreamingIncrDedup(docStream, snap, out, ckpt)
      .awaitTermination()
    val after1 = spark.read.parquet(out)
    assert(after1.select($"doc_id").as[Long].collect().toSet == Set(11L),
      "snapshot dup must be dropped, novel doc must land")

    // batch 2: doc 12 duplicates the ADMITTED doc 11 — it must be
    // caught by the signatures batch 1 committed back (no old-corpus
    // recompute anywhere); doc 13 is novel
    Seq((12L, textC), (13L, textD)).toDF("doc_id", "text")
      .write.parquet(s"$src/b2")
    Pipelines.runStreamingIncrDedup(docStream, snap, out, ckpt)
      .awaitTermination()
    val after2 = spark.read.parquet(out)
    assert(after2.select($"doc_id").as[Long].collect().toSet == Set(11L, 13L),
      "batch-1 admission must extend the gate for batch 2")

    // the snapshot advanced one version per non-empty admitted batch
    // and yesterday's version is still time-travelable
    val vs = graft.engine.VersionedTable.versions(spark, snap)
    assert(vs.size == 3, s"expected v0 + one per batch, got $vs")
    val v0 = graft.engine.VersionedTable.read(spark, snap, Some(vs.head))
    assert(v0.select($"doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L))

    // replay the last epoch against the same out dir: the epoch guard
    // makes it a no-op (no duplicate rows, no new snapshot version)
    val writer = Pipelines.writerToken(spark, ckpt)
    val lastBatch = Seq((12L, textC), (13L, textD)).toDF("doc_id", "text")
    Pipelines.incrDedupBatch(lastBatch, epochId = 0L, snap, out, writer)
    assert(spark.read.parquet(out).count() == after2.count())
    assert(graft.engine.VersionedTable.versions(spark, snap).size == 3)

    // crash-WINDOW replay: epoch-1 signatures are already committed
    // but the marker regressed (crash between snapshot commit and
    // marker write). The writer-scoped txn tag must exclude the
    // batch's OWN epoch-1 rows — without the filter the batch would
    // match ITSELF, overwrite epoch=1 with an empty dataset, and
    // silently destroy the landed docs. Same writer token (read from
    // the checkpoint) as the stream, exactly what a restarted query
    // presents.
    graft.engine.VersionedTable.atomicWrite(
      spark, out, s"_LAST_EPOCH_$writer", "0")
    Pipelines.incrDedupBatch(lastBatch, epochId = 1L, snap, out, writer)
    assert(spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet == Set(11L, 13L),
      "crash-window replay must reproduce the epoch output, not erase it")
    assert(graft.engine.VersionedTable.read(spark, snap)
      .select($"doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L, 11L, 13L),
      "replayed commit must rebuild the same snapshot content")
  }

  test("streaming incremental dedup: NEAR-dup (not byte-identical) batch docs are gated by banding") {
    // the existing gate tests use exact copies, which collide on EVERY
    // band; the ingest gate's real recall claim is about NEAR-dups —
    // high-jaccard variants must still collide on >= 1 of the 6 bands
    // (at j ~ 0.9 the all-band miss probability is ~5e-5; this fixture
    // is deterministic, so the collision either holds forever or the
    // test fails loudly and the banding regressed)
    val src = tmp("graft_snd_src")
    val snap = tmp("graft_snd_snap")
    val out = tmp("graft_snd_out")
    val ckpt = tmp("graft_snd_ckpt")
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // variant: two tokens swapped for new ones -> 3-gram jaccard ~0.85
    val variant = ((1 to 40).map {
      case 10 => "x10"
      case 30 => "x30"
      case i  => s"w$i"
    }).mkString(" ")
    val novel = (1 to 40).map(i => s"n$i").mkString(" ")
    graft.engine.VersionedTable.commit(
      graft.ops.Llm.mapOnlyBandedSignatures(graft.ops.Llm.shingleDocs(
        Seq((1L, base)).toDF("doc_id", "text"))), snap)
    Seq((10L, variant), (11L, novel)).toDF("doc_id", "text")
      .write.parquet(s"$src/b1")
    val docStream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src)
    Pipelines.runStreamingIncrDedup(docStream, snap, out, ckpt)
      .awaitTermination()
    val landed = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().toSet
    assert(landed == Set(11L),
      s"near-dup 10 must band-collide and drop, novel 11 must land: $landed")
  }

  test("streaming funnel matches the batch funnel on in-order data and ratchets across batches") {
    val src = tmp("graft_sfun_src")
    val out = tmp("graft_sfun_out")
    val ckpt = tmp("graft_sfun_ckpt")
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // the AdvancedSpec funnel plant: A full funnel, B broken order,
    // C click-after-purchase, D purchase only
    val plant = Seq(
      (1L, t(1), "A", "view"), (2L, t(2), "A", "click"),
      (3L, t(3), "A", "purchase"),
      (4L, t(1), "B", "click"), (5L, t(2), "B", "view"),
      (6L, t(3), "B", "purchase"),
      (7L, t(1), "C", "view"), (8L, t(2), "C", "purchase"),
      (9L, t(3), "C", "click"),
      (10L, t(1), "D", "purchase"))
    plant.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$src/b1")

    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id STRING, event_type STRING")
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .as[(Long, java.sql.Timestamp, String, String)]
      Pipelines.funnelStateful(stream)
        .toDF("user_id", "step", "ts")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    run()
    val steps1 = spark.read.parquet(out)
      .select($"user_id", $"step").as[(String, Int)].collect().toSet
    // same per-step user sets the batch op counts: n1=3 (A,B,C),
    // n2=2 (A,C), n3=1 (A)
    assert(steps1 == Set(("A", 1), ("A", 2), ("A", 3),
      ("B", 1), ("C", 1), ("C", 2)), s"got $steps1")

    // batch 2: B finally does click->purchase AFTER its view — the
    // ratcheted state must resume at step 1 and advance to 3
    Seq((11L, t(4), "B", "click"), (12L, t(5), "B", "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$src/b2")
    run()
    val steps2 = spark.read.parquet(out)
      .select($"user_id", $"step").as[(String, Int)].collect().toSet
    assert(steps2 == steps1 ++ Set(("B", 2), ("B", 3)),
      s"B must ratchet from persisted state: $steps2")
  }

  test("streaming decontamination gate drops eval-gram carriers, passes clean and short docs") {
    val src = tmp("graft_sdc_src")
    val out = tmp("graft_sdc_out")
    val ckpt = tmp("graft_sdc_ckpt")
    // eval doc: 8 tokens -> 4 distinct 5-grams
    val evalText = "e1 e2 e3 e4 e5 e6 e7 e8"
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    // 1: carries an eval 5-gram mid-text -> dropped
    // 2: clean -> lands;  3: shares only 4 consecutive eval tokens
    // (no full 5-gram) -> lands;  4: shorter than 5 tokens -> lands
    Seq(
      (1L, "a b e3 e4 e5 e6 e7 z"),
      (2L, "c1 c2 c3 c4 c5 c6"),
      (3L, "x e1 e2 e3 e4 y z w"),
      (4L, "t1 t2 t3 t4"))
      .toDF("doc_id", "text").write.parquet(s"$src/b1")

    def docStream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src)

    Pipelines.runStreamingDecontam(docStream, evalDocs, out, ckpt)
      .awaitTermination()
    val landed = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().toSet
    assert(landed == Set(2L, 3L, 4L),
      s"only the 5-gram carrier must drop: $landed")

    // the streaming verdict must MATCH the batch gate's on the same
    // docs — the gates share Llm.grams5Of, this asserts it end-to-end
    val batchGrams = graft.ops.Llm.grams5Of(
      Seq((1L, "a b e3 e4 e5 e6 e7 z"), (2L, "c1 c2 c3 c4 c5 c6"),
        (3L, "x e1 e2 e3 e4 y z w"), (4L, "t1 t2 t3 t4"))
        .toDF("doc_id", "text"))
    val evalG = graft.ops.Llm.grams5Of(evalDocs).select($"g")
    val batchVerdict = batchGrams.join(evalG, Seq("g"), "left_semi")
      .select($"doc_id").as[Long].collect().toSet
    assert(batchVerdict == Set(1L), "batch and stream gates agree")

    // replayed epoch (same marker) is a no-op; a second batch passes
    // through the same lineage idempotently
    Seq((5L, "n1 n2 n3 n4 n5 n6"), (6L, s"pre $evalText post"))
      .toDF("doc_id", "text").write.parquet(s"$src/b2")
    Pipelines.runStreamingDecontam(docStream, evalDocs, out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet == Set(2L, 3L, 4L, 5L),
      "batch 2: novel doc lands once, full-eval carrier drops")
  }

  test("streaming entity-resolution gate: annotates records with canonical matches, batch-equivalent, replay-idempotent") {
    val src = tmp("graft_ser_src")
    val out = tmp("graft_ser_out")
    val ckpt = tmp("graft_ser_ckpt")
    val canon = Seq((1L, "new york"), (2L, "los angeles"),
      (3L, "chicago"), (4L, "houston")).toDF("id", "s")
    // misspellings within edit 2, one exact, one unmatched
    val b1 = Seq((101L, "new yrok"), (102L, "chicago"),
      (103L, "houstn"), (104L, "zzzzzz"))
    b1.toDF("id", "s").write.parquet(s"$src/b1")
    def recStream = spark.readStream
      .schema("id LONG, s STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src)
    Pipelines.runStreamingEntityRes(recStream, canon, out, ckpt)
      .awaitTermination()
    val got1 = spark.read.parquet(out)
      .select($"id", $"canon_id", $"dist")
      .as[(Long, Option[Long], Option[Int])].collect().toSet
    assert(got1 == Set(
      (101L, Some(1L), Some(2)), (102L, Some(3L), Some(0)),
      (103L, Some(4L), Some(1)), (104L, None, None)),
      s"gate must annotate, never drop: $got1")

    // batch 2 through the same lineage — then the union of per-epoch
    // gate outputs must equal the BATCH face run over all records at
    // once (the operators share topKMatchAgainst by construction;
    // this pins it end to end)
    val b2 = Seq((105L, "los angelos"), (106L, "huston"))
    b2.toDF("id", "s").write.parquet(s"$src/b2")
    Pipelines.runStreamingEntityRes(recStream, canon, out, ckpt)
      .awaitTermination()
    val streamed = spark.read.parquet(out)
      .select($"id", $"canon_id", $"dist")
      .as[(Long, Option[Long], Option[Int])].collect().toSet
    val allRecords = (b1 ++ b2).toDF("id", "s")
    val batchFace = graft.ops.Joins.topKMatchAgainst(
        allRecords, canon, graft.ops.Joins.deletionVariants(canon, 2), 2, 1)
      .select($"qid", $"canon_id", $"dist")
      .as[(Long, Long, Int)].collect()
      .map { case (q, c, d) => (q, Some(c), Some(d)) }.toSet
    val unmatchedIds = (b1 ++ b2).map(_._1).toSet -- batchFace.map(_._1)
    assert(streamed == batchFace ++ unmatchedIds.map(id =>
      (id, None: Option[Long], None: Option[Int])),
      s"stream and batch faces must agree: $streamed")

    // replay idempotence, sharply: re-offer epoch 0 with DIFFERENT
    // rows — the marker must skip it and the landed data not change
    val canonNames = canon.select($"id", $"s").localCheckpoint(true)
    val canonVars = graft.ops.Joins.deletionVariants(canonNames, 2)
    val writerId = spark.read.parquet(s"$out")
      .inputFiles.head.split("/writer=")(1).split("/")(0)
    Pipelines.entityResGateBatch(
      Seq((999L, "replayed imposter")).toDF("id", "s"), 0L,
      canonNames, canonVars, 2, 1, out, writerId)
    val afterReplay = spark.read.parquet(out)
      .select($"id").as[Long].collect().toSet
    assert(afterReplay == streamed.map(_._1),
      s"replayed epoch must be a marker-skipped no-op: $afterReplay")
  }

  test("versioned entity-res canon: a live stream keeps its construction-time dictionary across a mid-run retrain; batch face serves current") {
    val src = tmp("graft_serv_src")
    val out = tmp("graft_serv_out")
    val ckpt = tmp("graft_serv_ckpt")
    val canonDir = tmp("graft_serv_canon")
    // v1 dictionary has no "houston" entry
    val v1 = Pipelines.commitCanon(
      Seq((1L, "new york"), (2L, "chicago")).toDF("id", "s"), canonDir)
    Seq((101L, "new yrok"), (102L, "houstn")).toDF("id", "s")
      .write.parquet(s"$src/b1")
    def recStream = spark.readStream
      .schema("id LONG, s STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src)
    // LIVE stream (processing-time trigger): the pin claim is about a
    // retrain committing while the stream keeps running
    val q = Pipelines.runStreamingEntityResVersioned(
      recStream, canonDir, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      q.processAllAvailable()
      // RETRAIN lands mid-run: v2 adds houston — the running stream
      // must NOT see it
      val v2 = Pipelines.commitCanon(
        Seq((1L, "new york"), (2L, "chicago"), (3L, "houston"))
          .toDF("id", "s"), canonDir)
      assert(v2 > v1)
      Seq((103L, "chicagoo"), (104L, "houstn")).toDF("id", "s")
        .write.parquet(s"$src/b2")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select($"id", $"canon_id", $"canon_version")
      .as[(Long, Option[Long], Long)].collect()
    // every annotation carries the PINNED version...
    assert(streamed.forall(_._3 == v1),
      s"live stream must stamp its construction-time version: ${streamed.toSeq}")
    val byId = streamed.map(r => r._1 -> r._2).toMap
    // ...and matches against the PINNED dictionary: "houstn" stays
    // unmatched in BOTH epochs — including the one processed after v2
    // (which contains houston) committed
    assert(byId == Map(
      101L -> Some(1L), 102L -> None, 103L -> Some(2L), 104L -> None),
      s"pinned-dictionary annotations: $byId")

    // the BATCH face serves CURRENT: the same "houstn" record now
    // resolves, stamped with the retrained version
    val batchGot = Pipelines.entityResolveCurrent(
        Seq((104L, "houstn")).toDF("id", "s"), canonDir)
      .select($"id", $"canon_id", $"canon_version")
      .as[(Long, Option[Long], Long)].collect().toSeq
    assert(batchGot == Seq((104L, Some(3L), v1 + 1)),
      s"batch face must serve the retrained dictionary: $batchGot")
  }

  test("streaming incremental dedup: bootstraps an empty snapshot and gates short docs exactly") {
    val src = tmp("graft_sidb_src")
    val snap = tmp("graft_sidb_snap") // NO pre-committed version
    val out = tmp("graft_sidb_out")
    val ckpt = tmp("graft_sidb_ckpt")

    def docStream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src)

    // batch 1 against the EMPTY snapshot: everything must land,
    // including the 1-token doc MinHash cannot shingle and the
    // NULL-text doc neither path could band before the null-safe fix
    Seq((1L, "solo"), (2L, "alpha beta gamma delta epsilon zeta"),
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.parquet(s"$src/b1")
    Pipelines.runStreamingIncrDedup(docStream, snap, out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 7L), "bootstrap batch must land whole")

    // batch 2: the short doc reappears — the degenerate exact band
    // must catch it (it has no shingles to band on); a new doc lands
    Seq((3L, "solo"), (4L, "eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text").write.parquet(s"$src/b2")
    Pipelines.runStreamingIncrDedup(docStream, snap, out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L, 7L),
      "short-doc dup must be gated by its exact band")

    // a FRESH checkpoint against the SAME snapshot — epoch ids restart
    // at 0. The writer-scoped txn tag must keep every accumulated
    // signature in the gate (an unscoped `epoch < 0` filter would
    // re-admit the whole corpus and then DROP all accreted signatures
    // from its first commit): re-sent docs gate as dups, including a
    // second null-text doc, and only the genuinely novel doc lands
    val src2 = tmp("graft_sidb_src2")
    val out2 = tmp("graft_sidb_out2")
    val ckpt2 = tmp("graft_sidb_ckpt2")
    def docStream2 = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src2)
    Seq((5L, "solo"), (6L, "nu xi omicron pi rho sigma"),
      (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.parquet(s"$src2/b1")
    Pipelines.runStreamingIncrDedup(docStream2, snap, out2, ckpt2)
      .awaitTermination()
    assert(spark.read.parquet(out2).select($"doc_id").as[Long]
      .collect().toSet == Set(6L),
      "a new writer must gate against the full accumulated snapshot")
    // and the snapshot retained the first writer's signatures: doc 1's
    // exact band is still present for yet another writer
    val bands = graft.engine.VersionedTable.read(spark, snap)
    assert(bands.filter($"band_idx" === -1).count() >= 2,
      "accreted exact bands must survive the new writer's commit")

    // fresh checkpoint reusing the SAME outDir: the restarted epoch 0
    // must neither be skipped against the dead lineage's marker nor
    // clobber its epoch partitions — writer-scoped markers and
    // writer=<id>/epoch=<n> output partitions keep lineages disjoint
    val src3 = tmp("graft_sidb_src3")
    val ckpt3 = tmp("graft_sidb_ckpt3")
    def docStream3 = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .parquet(src3)
    Seq((9L, "tau upsilon phi chi psi omega"))
      .toDF("doc_id", "text").write.parquet(s"$src3/b1")
    Pipelines.runStreamingIncrDedup(docStream3, snap, out, ckpt3)
      .awaitTermination()
    assert(spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L, 7L, 9L),
      "outDir reuse: old lineage's epochs must survive and the new batch must land")
  }

  test("maxFilesPerTrigger bounds each backfill micro-batch (rate-limited catch-up)") {
    // a restarted stream facing a large backlog must NOT load the
    // whole backlog into one giant micro-batch — maxFilesPerTrigger
    // is the knob, and Trigger.AvailableNow honors it (unlike the
    // deprecated Trigger.Once, which ignored rate limits)
    val src = tmp("graft_rate_src")
    (1 to 3).foreach { i =>
      Files.writeString(Paths.get(src, s"raw_$i.jsonl"), stateLines.head)
    }
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(src)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes += b.count()
        ()
      }
      .option("checkpointLocation", tmp("graft_rate_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(sizes.length == 3, s"3 files at 1 file/trigger must make 3 batches, got $sizes")
    assert(sizes.forall(_ == 1L), s"each batch must hold exactly one file's rows, got $sizes")
  }

  // ---- late-data semantics under a LIVE watermark (X5) ----
  //
  // The reference silently appends late records (SURVEY.md §2.9 X5);
  // this engine claims the stricter Structured Streaming contract:
  // once the watermark (max event time − delay) passes a window's
  // end, a late event for that window is DROPPED, while on-time
  // events arriving in the very same micro-batch are admitted. These
  // two tests feed a controlled batch sequence through MemoryStream
  // and prove both halves of that claim.

  private def evTs(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("tumbling watermark: late event dropped, on-time peer in same batch admitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Pipelines.tumblingCounts(
        mem.toDS().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("late_tumbling")
      .outputMode("append")
      .start()
    try {
      // batch 1: window 00:00 gets one event; the 06:00 event advances
      // the watermark to 04:00 (2h delay), closing window 00:00-01:00
      mem.addData((evTs(0, 30), "click", 1.0), (evTs(6, 0), "click", 1.0))
      q.processAllAvailable()
      // batch 2: 00:45 is LATE (its window end 01:00 < watermark
      // 04:00) — must be dropped; 06:30 in the SAME batch is on-time
      mem.addData((evTs(0, 45), "click", 100.0), (evTs(6, 30), "click", 1.0))
      q.processAllAvailable()
      // batch 3: push the watermark past 07:00 so append-mode emits
      // the 06:00 window
      mem.addData((evTs(12, 0), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("late_tumbling")
      .select($"window_start", $"cnt", $"sum_value")
      .collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // late 100.0 did NOT land in the closed window
    assert(got(evTs(0, 0)) == ((1L, 1.0)))
    // the on-time event that shared the late event's batch survived
    assert(got(evTs(6, 0)) == ((2L, 2.0)))
  }

  test("session watermark: late event dropped, concurrent on-time session extends") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = Pipelines.sessionCounts(mem.toDS().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("late_session")
      .outputMode("append")
      .start()
    try {
      // batch 1: u1 opens a session at 00:00; u2's 06:00 event moves
      // the watermark to 04:00, expiring u1's session state
      mem.addData((evTs(0, 0), 1L), (evTs(6, 0), 2L))
      q.processAllAvailable()
      // batch 2: u1's 00:05 event is LATE (session would end 00:35 <
      // watermark 04:00) — dropped; u2's 06:10 extends the live session
      mem.addData((evTs(0, 5), 1L), (evTs(6, 10), 2L))
      q.processAllAvailable()
      // batch 3: advance the watermark so all sessions emit
      mem.addData((evTs(12, 0), 3L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("late_session")
      .select($"user_id", $"n_events", $"session_end")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getTimestamp(2))))
      .toMap
    // u1's session holds ONLY the on-time event — the late 00:05 was
    // dropped, not silently appended (the reference's behavior)
    assert(got(1L) == ((1L, evTs(0, 30))))
    // u2's same-batch on-time event extended the session: 2 events,
    // gap-based close at 06:10 + 30min
    assert(got(2L) == ((2L, evTs(6, 40))))
  }

  test("refresh sink is idempotent under epoch re-delivery: replay commits nothing") {
    import graft.engine.VersionedTable
    val serving = tmp("graft_epoch_serving")
    val b = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Pipelines.refreshBatch(b, 0L, "k", serving)
    // the marker is writer-scoped (default writer id here)
    assert(Pipelines.lastEpoch(spark, serving, "_LAST_EPOCH_default")
      .contains(0L))
    val versionsBefore = VersionedTable.versions(spark, serving)
    val contentBefore = VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toMap
    // crash-replay: foreachBatch re-delivers the SAME epoch after a
    // restart whose checkpoint write didn't land
    Pipelines.refreshBatch(b, 0L, "k", serving)
    assert(VersionedTable.versions(spark, serving) == versionsBefore,
      "a replayed epoch must not commit a new version")
    assert(VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toMap == contentBefore,
      "serving content must be byte-identical after replay")
    // the marker-race fallback: same DATA arriving as a NEW epoch
    // advances the version but converges to the same content (the
    // upsert is idempotent by key) — row counts conserved
    Pipelines.refreshBatch(b, 1L, "k", serving)
    assert(VersionedTable.versions(spark, serving).size
      == versionsBefore.size + 1)
    assert(VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toMap == contentBefore)
    // a genuinely new batch still applies
    Pipelines.refreshBatch(Seq((2L, "B2"), (3L, "c")).toDF("k", "v"),
      2L, "k", serving)
    assert(VersionedTable.read(spark, serving)
      .as[(Long, String)].collect().toMap
      == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("streaming funnel latency matches the batch op's conversions on in-order data") {
    val src = tmp("graft_sflat_src")
    val out = tmp("graft_sflat_out")
    val ckpt = tmp("graft_sflat_ckpt")
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // A converts (t0=1, t1=3); B's purchase precedes its qualified
    // click (no conversion); C converts late (t0=1, t1=9, click ties
    // handled by event_id order); D never views
    val plant = Seq(
      (1L, t(1), "A", "view"), (2L, t(2), "A", "click"),
      (3L, t(3), "A", "purchase"), (4L, t(9), "A", "purchase"),
      (5L, t(1), "B", "click"), (6L, t(2), "B", "view"),
      (7L, t(3), "B", "purchase"),
      (8L, t(1), "C", "view"), (9L, t(2), "C", "click"),
      (10L, t(9), "C", "purchase"),
      (11L, t(1), "D", "purchase"), (12L, t(2), "D", "click"))
    plant.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$src/b1")
    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id STRING, event_type STRING")
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .as[(Long, java.sql.Timestamp, String, String)]
      Pipelines.funnelLatencyStateful(stream)
        .toDF("user_id", "t0", "t1")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    run()
    val got = spark.read.parquet(out)
      .select($"user_id", $"t0", $"t1")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSet
    assert(got == Set(("A", t(1), t(3)), ("C", t(1), t(9))), s"got $got")
    // batch parity on the same matrix: the batch op's per-user
    // (t0, t1) reduction over the planted events dir must agree
    val dir = tmp("graft_sflat_batch")
    plant.map { case (id, ts, u, e) => (id, u, e, ts) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.ops.Advanced.funnelLatency(spark, dir)
      .as[(Long, Double, Double, Double)].collect().head
    // two conversions, 2s and 8s: p50 midpoint 5.0, p90 at 7.4
    assert(batch._1 == got.size.toLong,
      s"stream conversion count must equal the batch op: $batch vs ${got.size}")
    val streamDt = got.toSeq.map(r =>
      (r._3.getTime - r._2.getTime) / 1000.0).sorted
    assert(streamDt == Seq(2.0, 8.0) && batch._2 == 5.0,
      s"stream deltas $streamDt must be the batch op's sample: $batch")
    // cross-batch ratchet: B's click->purchase arrives AFTER its view
    // was folded — the persisted flags qualify it and B converts with
    // t0 carried across batches (epoch-micros state)
    Seq((13L, t(4), "B", "click"), (14L, t(5), "B", "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$src/b2")
    run()
    val got2 = spark.read.parquet(out)
      .select($"user_id", $"t0", $"t1")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSet
    assert(got2 == got + (("B", t(2), t(5))),
      s"B must convert from persisted state with its original t0: $got2")
  }

  test("streaming cohort increments aggregate to the batch cohort retention") {
    val src = tmp("graft_scoh_src")
    val out = tmp("graft_scoh_out")
    val ckpt = tmp("graft_scoh_ckpt")
    def d(day: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-${day}%02d 12:00:00")
    // the AdvancedSpec cohort plant: A week0 twice (dedup), week1,
    // week3; B first seen week1, week2
    val plant = Seq(
      (1L, d(1), "A"), (2L, d(2), "A"), (3L, d(8), "A"), (4L, d(22), "A"),
      (5L, d(9), "B"), (6L, d(16), "B"))
    plant.toDF("event_id", "ts", "user_id").write.parquet(s"$src/b1")
    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id STRING")
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .as[(Long, java.sql.Timestamp, String)]
      Pipelines.cohortStateful(stream)
        .toDF("cohort_week", "week_offset")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    run()
    def aggregated() = spark.read.parquet(out)
      .groupBy($"cohort_week", $"week_offset")
      .agg(count(lit(1)).as("n_users"))
      .as[(Int, Int, Long)].collect().toSet
    val dir = tmp("graft_scoh_batch")
    plant.map { case (id, ts, u) => (id, u, ts) }
      .toDF("event_id", "user_id", "ts")
      .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.ops.Advanced.cohortRetention(spark, dir)
      .select($"cohort_week", $"week_offset", $"n_users")
      .as[(Int, Int, Long)].collect().toSet
    assert(aggregated() == batch,
      s"stream increments must aggregate to the batch op:\n" +
        s" stream=${aggregated()}\n batch=$batch")
    // incremental batch 2: A returns in week 5, a NEW user C starts —
    // increments stay exactly-once per (user, week) across restarts
    Seq((7L, d(2), "A"), (8L, java.sql.Timestamp.valueOf(
      "2024-02-05 12:00:00"), "A"), (9L, d(23), "C"))
      .toDF("event_id", "ts", "user_id").write.parquet(s"$src/b2")
    run()
    val expected2 = batch ++ Set(
      (batch.map(_._1).min, 5, 1L), // A's 2024-02-05 lands at offset 5
      (batch.map(_._1).min + 3, 0, 1L)) // C cohorts alone at week3+
    assert(aggregated() == expected2,
      s"dedup must hold across batches: ${aggregated()} vs $expected2")
  }
}
