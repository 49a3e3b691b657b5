package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up reader/codegen paths so the first timed query is not
    // charged for one-time session initialization
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // a failing query must be VISIBLE: it is excluded from the timing
    // total and reported in an "errors" object, never recorded as a
    // (fast-looking) duration
    // per-query PHYSICAL counters (graft.engine.Metrics) ride along in
    // the artifact file: a bench record that can show "nothing spilled,
    // heaviest shuffle was q_X at N MB" carries the scale claim; the
    // stdout contract line stays unchanged for the driver
    val phys = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-query GC wall: a reading whose tasks are uniformly slow with
    // clean shuffle/spill counters and a quiet CPU sentinel (round-12's
    // 28.7 s q_llm_dedup_substr_rm) is otherwise unattributable — the
    // one mechanism that fits that signature is allocation/GC pressure
    // (the build allocates GB/s of short-lived strings; the sentinel's
    // tight hash loop barely allocates, so it cannot see it). Recording
    // collector time inside the window makes the next such row
    // self-attributing: wall >> task work + gc_ms ~ wall = GC thrash.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    // which sentinel window each timed row ran in ("sw" in its phys
    // row): round 13's r12→r13 diff had ~12 untouched rows +0.9-1.9 s
    // that three sentinel points could not localize — with a sentinel
    // every ~25 entries, a scattered regression decomposes row-by-row
    // (its window's sentinel either shows the contention or rules it
    // out)
    var curWindow = "pre"
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val gc0 = gcMillis()
      val (err, m) = graft.engine.Metrics.measure(spark) {
        // full evaluation into the no-op sink — count() lets Catalyst
        // prune ungrouped aggregate expressions and final sorts, so a
        // count-actioned bench under-times exactly the queries whose
        // values are the work (see graft.util.Exec.drain)
        try { graft.util.Exec.drain(fn(spark, sfDir)); None }
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAILURE $name: $e")
            Some(e.getClass.getSimpleName)
        }
      }
      phys(name) = s"""{"sw":"$curWindow",""" +
        s""""shuffle_mb":${m.shuffleWriteBytes / 1048576},""" +
        s""""spill_mb":${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576},""" +
        s""""gc_ms":${gcMillis() - gc0},""" +
        s""""tasks":${m.tasks},"spread":${
          // JSON requires a dot decimal separator regardless of the
          // JVM default locale (the f-interpolator would emit "1,5"
          // under a comma-decimal locale and corrupt the artifact)
          String.format(java.util.Locale.ROOT, "%.1f",
            Double.box(m.taskSpread))}}"""
      val dt = m.wallMs / 1e3
      // release per-query caches so later queries aren't charged for
      // earlier queries' cached blocks / GC pressure
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc() // take the collection between queries, not inside one
      (dt, err)
    }
    // host-contention sentinel (round 11): the SAME fixed work —
    // a pure-CPU hash fold over 8M generated longs plus one tiny
    // 64-key shuffle, no table reads, no corpus dependence — timed at
    // suite start, midpoint, and end. Three rounds were spent
    // attributing one entry's driver-run readings to host windows the
    // artifact itself couldn't show; the sentinel makes the window
    // visible IN the record: start/mid/end should read within ~2x of
    // each other on a quiet host, and a 3-10x excursion brackets
    // which suite third a contended reading landed in (see
    // BASELINE.md "Reading the sentinel").
    val sentinels = scala.collection.mutable.LinkedHashMap[String, Double]()
    def sentinel(tag: String): Unit = {
      import org.apache.spark.sql.functions.{col, max, sum, xxhash64, conv}
      val t0 = System.nanoTime()
      // max, not sum: xxhash64 spans the full Long range and an 8M-row
      // sum overflows under ANSI arithmetic
      graft.util.Exec.drain(
        spark.range(0, 8000000L, 1, 8)
          .select(max(xxhash64(conv(col("id"), 10, 16))).as("h")))
      graft.util.Exec.drain(
        spark.range(0, 200000L, 1, 8).groupBy(col("id") % 64)
          .agg(sum(col("id")).as("s")))
      sentinels(tag) = (System.nanoTime() - t0) / 1e9
      curWindow = tag
      spark.sharedState.cacheManager.clearCache()
    }
    val entries = SparkEntry.queries.toSeq
    // one untimed pass first: the sentinel plan's own codegen is a
    // one-time cost that would inflate ONLY the "start" reading
    // (measured ~2.3x) and fake exactly the contention signature the
    // sentinel exists to expose
    sentinel("warmup"); sentinels.remove("warmup")
    sentinel("start")
    val firstPass = entries.zipWithIndex.map { case ((name, fn), i) =>
      // interleave a sentinel every 25 entries (round-13 verdict #2):
      // O(10) readings across ~200 entries, so a mid-run host window
      // is localized to the ~25 rows it actually hit instead of a
      // whole suite third, and the median normalizer below has enough
      // points to shrug off one transient spike
      if (i > 0 && i % 25 == 0) sentinel(s"s$i")
      // q_fn_variant dispatches to a committed shredded snapshot when
      // one exists; whether q_fn_variant_shredded's memoized build ran
      // first is map-order luck, so pin this row to the PARSE regime
      // (the shredded row already prices the serve) — without this the
      // two rows could read as duplicates of each other
      if (name == "q_fn_variant" || name == "q_fn_variant_multi")
        graft.ops.ScalarFns.invalidateShredTableCache()
      // both SHREDDED entries share one memo: whichever ran second in
      // map order would price a serve-only read under a row documented
      // as build+commit+serve — pin each to the COLD regime outright
      // (same rationale as the committed-index entries below)
      if (name == "q_fn_variant_shredded" || name == "q_fn_variant_multi_shredded")
        graft.ops.ScalarFns.invalidateShredTableCache()
      // same pin for the two committed-AnnIndex dispatch entries: map
      // order happens to run them before q_llm_ann_index commits one
      // today, but that is CHAMP-hash luck any added key reshuffles —
      // pin the first pass to the FIT regime explicitly (the ann_index
      // rows already price the serve)
      if (name == "q_llm_ann_ivf" || name == "q_llm_knn_join_ivf")
        graft.ops.Llm.invalidateAnnIndexCache()
      // the two committed-index entries are pinned COLD outright
      // (drop any index an earlier entry committed): each row prices
      // one deterministic build+commit+serve, and the recurring serve
      // regime gets its own explicit _warm row below; a 5x-median
      // rerun re-prices the same cold regime (the rerun block drops
      // the index first), so min() never mixes regimes
      if (name == "q_llm_ann_index" || name == "q_llm_ann_pq_index")
        graft.ops.Llm.invalidateAnnIndexCache()
      // the substring pair shares one islands memo; map order decided
      // which row paid the build and which served it (round-12 found
      // the detection row under-pricing a warm serve by luck). Pin:
      // _rm = COLD build+commit+removal (drop any memo an earlier
      // entry built), detection = declared WARM serve (untimed ensure
      // first) — the recurring production regime for a second consumer
      if (name == "q_llm_dedup_substr_rm")
        graft.ops.Llm.invalidateIslandsCache()
      if (name == "q_llm_dedup_substr") {
        try graft.util.Exec.drain(fn(spark, sfDir))
        catch { case _: Throwable => () } // the timed run reports it
      }
      val (dt, err) = timeOne(name, fn)
      (name, dt, err)
    }
    // explicit WARM rows for the committed-index entries: guarantee a
    // committed index exists (untimed ensure — a build if the first
    // pass's artifact was invalidated since), then time the pure
    // dispatch-served read — the number that recurs in production,
    // now a deterministic row instead of a rerun adjudication. Two
    // readings, min reported: these rows are exempt from the 5x-median
    // rerun machinery (a cache-dropped rerun would change their
    // regime), so a second same-regime reading is their only defense
    // against a host window — and they run BEFORE sentinel("end") so
    // the sentinel brackets them like every other entry.
    val warmRows = Seq("q_llm_ann_index", "q_llm_ann_pq_index").map { name =>
      val fn = SparkEntry.queries(name)
      try graft.util.Exec.drain(fn(spark, sfDir))
      catch { case _: Throwable => () } // the timed run reports the error
      // distinct phys keys per reading: timing the same key twice
      // would leave the LinkedHashMap holding only the second run's
      // physical counters while the reported duration is min(dt1,dt2)
      // — the artifact's counters row could then describe the
      // discarded reading (round-12 ADVICE)
      val (dt1, err1) = timeOne(name + "_warm_1", fn)
      val (dt2, err2) = timeOne(name + "_warm_2", fn)
      // the _warm phys row must describe the READING that is reported,
      // not whichever run happened to execute last
      val (row, physOf) =
        if (err1.isEmpty && err2.isEmpty) {
          if (dt1 <= dt2) ((name + "_warm", dt1, err1), name + "_warm_1")
          else ((name + "_warm", dt2, err2), name + "_warm_2")
        } else if (err1.isEmpty) ((name + "_warm", dt1, err1), name + "_warm_1")
        else ((name + "_warm", dt2, err2), name + "_warm_2")
      phys(name + "_warm") = phys(physOf)
      row
    }
    sentinel("end")
    // Self-defense against degraded host windows: this host's
    // run-to-run band reaches ~60x on single-shot readings (round 3
    // recorded a 251 s entry that re-measures at 4 s). Any query whose
    // first reading exceeds 5x the suite median is re-measured and the
    // MIN is reported, with both readings kept in a "reruns" object so
    // the record shows its own adjudication. Memo caches are
    // invalidated before each re-run so the second reading prices the
    // real work (fit/convergence/layout), not a warm memo.
    val okTimes = firstPass.collect { case (_, v, None) => v }.sorted
    val median = if (okTimes.isEmpty) 0.0 else okTimes(okTimes.size / 2)
    val threshold = math.max(5 * median, 1.5)
    // each value is a rendered JSON object: {"first":..,"rerun":..} on
    // success, {"first":..,"rerun_error":".."} when the cold-cache
    // rerun itself fails — a failed adjudication attempt must be
    // visible in the record, not silently dropped
    val reruns = scala.collection.mutable.LinkedHashMap[String, String]()
    // only WARM-pinned rows are exempt from rerun adjudication: the
    // rerun machinery's cache invalidation would re-price them COLD
    // and min() would mix regimes (q_llm_dedup_substr serves the
    // islands memo). COLD-pinned rows stay rerun-eligible — their
    // cache-dropped rerun re-prices the SAME cold regime, which is
    // their only defense against a host window landing on a pinned
    // single-shot reading (round 13: a contended start sentinel put
    // q_llm_ann_pq_index at 22.1 s while its own warm row read
    // 0.53 s and its forced twin 5.4 s — with no rerun, that one
    // reading stood as the row)
    val noRerun = Set("q_llm_dedup_substr")
    val results = firstPass.map { case (name, dt, err) =>
      if (err.isEmpty && dt > threshold && !noRerun(name)) {
        graft.ops.Ml.invalidateFitCache()
        graft.ops.Llm.invalidateCellCache()
        graft.ops.Llm.invalidateClusterLabelCache()
        graft.ops.Llm.invalidateIslandsCache()
        graft.ops.Llm.invalidateSnapshotSigCache()
        graft.ops.Llm.invalidatePqCache()
        // scoped: wiping the Z-ordered table during an UNRELATED
        // rerun would silently turn the later q_data_skipping_read
        // entry into a full write+read
        if (name == "q_data_skipping")
          graft.ops.Advanced.invalidateSkipTableCache()
        // scoped for the same reason: these entries' memoized builds
        // are the cost a cold rerun exists to re-measure
        if (name == "q_bucketed_join")
          graft.ops.Advanced.invalidateBucketTableCache()
        if (name == "q_table_dml" || name == "q_table_changes")
          graft.ops.Advanced.invalidateDmlTableCache()
        // q_fn_variant: same parse-regime pin as the first pass —
        // min() must never compare a parse reading against a serve one
        if (name == "q_fn_variant_shredded" || name == "q_fn_variant" ||
            name == "q_fn_variant_multi_shredded" ||
            name == "q_fn_variant_multi")
          graft.ops.ScalarFns.invalidateShredTableCache()
        if (name == "q_llm_shard_resume")
          graft.ops.Llm.invalidateShardTableCache()
        // scoped like the bucketed/dml entries: the canon artifact is
        // memoized per session (round-14), so a cold rerun must drop
        // it to re-price the same commit+resolve regime
        if (name == "q_entity_resolve")
          graft.ops.StreamingOps.invalidateCanonCache()
        // these four either dispatch to a committed AnnIndex (the
        // fit-pinned pair) or ARE the committed-index cold rows: in
        // every case the rerun must drop the index so the second
        // reading re-prices the first pass's exact regime (fit or
        // cold build+commit+serve), never a warm dispatch
        if (name == "q_llm_ann_ivf" || name == "q_llm_knn_join_ivf" ||
            name == "q_llm_ann_index" || name == "q_llm_ann_pq_index")
          graft.ops.Llm.invalidateAnnIndexCache()
        if (name == "q_llm_bpe_apply")
          graft.ops.Llm.invalidateBpeTableCache()
        timeOne(name, SparkEntry.queries(name)) match {
          case (dt2, None) =>
            reruns(name) = s"""{"first":$dt,"rerun":$dt2}"""
            (name, math.min(dt, dt2), err)
          case (_, Some(e2)) =>
            reruns(name) = s"""{"first":$dt,"rerun_error":"$e2"}"""
            (name, dt, err)
        }
      } else (name, dt, err)
    }
    // split q_data_skipping's one-time Z-ordered WRITE from its pruned
    // READ: the committed table is memoized per (session, dir), so this
    // second invocation pays only the manifest-pruned read path — the
    // number that actually recurs in production (the write is a nightly
    // OPTIMIZE). Recorded as its own entry beside the combined one.
    val skipRead =
      try {
        val t0 = System.nanoTime()
        graft.util.Exec.drain(graft.ops.Advanced.dataSkipping(spark, sfDir))
        Some(("q_data_skipping_read", (System.nanoTime() - t0) / 1e9, None))
      } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE q_data_skipping_read: $e")
          Some(("q_data_skipping_read", 0.0, Some(e.getClass.getSimpleName)))
      }
    // bracket the rerun-adjudication tail too (round-14): reruns run
    // AFTER sentinel("end"), so a contention window landing on them —
    // observed: a rerun block reading 18-35 s on rows whose first
    // readings were 4-10 s — was invisible to the sentinel record and
    // the min() adjudication silently kept the first reading with no
    // explanation in the artifact. "post" closes the bracket.
    sentinel("post")
    val all = results ++ warmRows ++ skipRead
    val ok = all.collect { case (k, v, None) => k -> v }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = all.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val rr = reruns.map { case (k, obj) => s"\"" + k + "\":" + obj }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    // sentinel-normalized auxiliary total (round-12 verdict #8): the
    // same-HEAD afternoon band spread 276-283 s while the fixed-CPU
    // sentinel drifted in proportion — scale the total by a committed
    // reference sentinel (0.60 s: the quiet-morning band this host
    // reads when idle, BASELINE.md "Reading the bench contention
    // sentinel") over the run's MEDIAN sentinel. Median, not mean
    // (round-13 verdict #1): with sentinels 0.79/2.49/0.71 — one
    // mid-run spike — the mean 1.33 "normalized" a raw 267.9 s to
    // 120.6 s while the true sustained drift was ~+10%; the median of
    // the ~10 interleaved readings ignores a transient excursion and
    // only corrects for genuinely sustained load. Auxiliary only —
    // the gate number stays the raw total.
    val sentinelRef = 0.60
    val sentMedian =
      if (sentinels.isEmpty) sentinelRef
      else {
        val sorted = sentinels.values.toSeq.sorted
        sorted(sorted.size / 2)
      }
    val totalNorm = total * (sentinelRef / math.max(sentMedian, 1e-9))
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"reruns":$rr,"sf":"$sfDir","total_s":$total,"n_entries":${ok.size}}"""
    println(json)
    // the stdout capture truncates long lines (round 5's BENCH JSON
    // lost its tail) — persist the full record as its own artifact so
    // the per-query map survives end-to-end; the artifact additionally
    // carries the per-query physical counters (latest pass — for
    // rerun-adjudicated queries that is the cold-cache rerun)
    val physJson = phys.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sentJson = sentinels.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val artifact =
      json.dropRight(1) + s""","phys":$physJson,"sentinel":$sentJson,""" +
        s""""sentinel_ref":$sentinelRef,"total_norm_s":$totalNorm}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"${sys.props("user.dir")}/BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (artifact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"BENCH artifact write failed: $e") }
    // LAST stdout line = a COMPACT summary that fits the driver's
    // 2 KB stdout-tail capture (the full per-query line above
    // overflows it and parsed as null in BENCH_r11.json); the full
    // record lives in the artifact file
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
        s""""total_s":$total,"n_entries":${ok.size},""" +
        s""""errors":${all.count(_._3.isDefined)},"reruns":${reruns.size},""" +
        s""""sentinel":$sentJson,"total_norm_s":$totalNorm,""" +
        s""""full_record":"$out"}"""
    println(compact)
    spark.stop()
  }
}
