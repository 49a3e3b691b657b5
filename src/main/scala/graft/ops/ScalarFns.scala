package graft.ops

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Scalar functions (SURVEY.md §2.8, F1–F15).
  *
  * Reference behaviors re-expressed as native Catalyst expressions (the
  * reference computes all of these with row-wise pandas `apply` — here
  * every one is codegen'd, no UDFs):
  *  - F1/F2 string normalization `lower/trim/cast`
  *    (`services/consumer/consumer.py:37,70,88`);
  *  - F3/F4 unix-seconds -> timestamp, hour extraction
  *    (`services/analytics/app.py:118`, `services/dashboard/dashboard.py:90`);
  *  - F5/F6 timestamp parse/format (`services/dashboard/dashboard.py:54-83`);
  *  - F8 coalesce-fill (`services/silver_layer/process_silver.py:247-248`);
  *  - F9 clamp (`services/analytics/app.py:244,454`);
  *  - F10 conditional (`services/analytics/app.py:451-455`);
  *  - F11 arithmetic (`services/analytics/app.py:245,377`);
  *  - F12 binning (`services/analytics/app.py:246-250`);
  *  - F13 great-circle dead-reckoning (`services/analytics/app.py:369-402`);
  *  - F14 lat/lon -> region CASE (`services/dashboard/dashboard.py:94-114`);
  *  - F15 JSON path extraction (`services/silver_layer/process_silver.py:80-89`).
  *
  * Scale notes: every expression here stays inside whole-stage codegen
  * (no Python/Scala closures on the hot path); the trig pipeline F13 is
  * a pure column expression — the reference's per-row `apply` is the
  * exact antipattern at 100 TB.
  */
object ScalarFns {

  /** F1/F2: trim + lower + cast normalization, length. */
  val fnString: Q = (spark, dir) =>
    Tables(spark, dir, "customer").selectExpr(
      "c_custkey",
      "lower(trim(c_name)) AS name_norm",
      "upper(c_mktsegment) AS seg_upper",
      "length(c_name) AS name_len")
      .orderBy(col("c_custkey"))

  /** F3: seconds-since-epoch -> timestamp and back. */
  val fnTsFromUnix: Q = (spark, dir) =>
    Tables(spark, dir, "events").select(
      col("event_id"),
      unix_timestamp(col("ts")).as("unix_s"),
      timestamp_seconds(unix_timestamp(col("ts"))).as("ts_rt"))
      .orderBy(col("event_id"))

  /** F4: calendar part extraction. */
  val fnHour: Q = (spark, dir) =>
    Tables(spark, dir, "events").select(
      col("event_id"),
      hour(col("ts")).as("hr"),
      dayofmonth(col("ts")).as("dy"),
      month(col("ts")).as("mon"))
      .orderBy(col("event_id"))

  /** F5: format to a filename-style string, parse back. */
  val fnTsParse: Q = (spark, dir) =>
    Tables(spark, dir, "events").select(
      col("event_id"),
      to_timestamp(
        date_format(col("ts"), "yyyyMMdd_HHmmss"),
        "yyyyMMdd_HHmmss").as("parsed"))
      .orderBy(col("event_id"))

  /** F6: human-readable date formatting. */
  val fnDateFormat: Q = (spark, dir) =>
    Tables(spark, dir, "events").select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm").as("fmt"))
      .orderBy(col("event_id"))

  /** F8: nullif + coalesce fill. */
  val fnCoalesce: Q = (spark, dir) =>
    Tables(spark, dir, "events").selectExpr(
      "event_id",
      "coalesce(nullif(event_type, 'click'), 'unknown') AS etype_filled")
      .orderBy(col("event_id"))

  /** F9: clamp into [10, 100]. */
  val fnClamp: Q = (spark, dir) =>
    Tables(spark, dir, "events").select(
      col("event_id"),
      least(greatest(col("value"), lit(10.0)), lit(100.0)).as("clamped"))
      .orderBy(col("event_id"))

  /** F10: multi-branch conditional. */
  val fnWhen: Q = (spark, dir) =>
    Tables(spark, dir, "events").select(
      col("event_id"),
      when(col("value") > 100.0, "high")
        .when(col("value") > 10.0, "mid")
        .otherwise("low").as("tier"))
      .orderBy(col("event_id"))

  /** F11: net-price arithmetic (marker-size / distance analog). */
  val fnArith: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem").select(
      col("l_orderkey"),
      col("l_linenumber"),
      // raw IEEE product — same operand order as the oracle SQL, so the
      // result is bitwise identical; rounding scalars would *introduce*
      // cross-engine half-boundary divergence
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"))

  /** F12: bucketize by value bands (altitude-bin analog). */
  val fnBucketize: Q = (spark, dir) =>
    Tables(spark, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") < 1000.0, "0-1k")
        .when(col("o_totalprice") < 10000.0, "1k-10k")
        .when(col("o_totalprice") < 50000.0, "10k-50k")
        .when(col("o_totalprice") < 100000.0, "50k-100k")
        .otherwise("100k+").as("bucket"))
      .orderBy(col("o_orderkey"))

  /** F13: physics dead-reckoning via great-circle step — pure column
    * trig, no UDF. Position/heading/speed synthesized from numeric
    * columns; identical SQL text runs on the DuckDB side. */
  private val geoExprs = Seq(
    "l_quantity * 2.0 - 50.0 AS lat",
    "(l_extendedprice % 360.0) - 180.0 AS lon",
    "CAST(l_suppkey % 360 AS DOUBLE) AS track",
    "l_tax * 2000.0 AS speed_ms")
  private val geoPredict = Seq(
    "round(degrees(asin(sin(radians(lat)) * cos(speed_ms * 300.0 / 6371000.0)" +
      " + cos(radians(lat)) * sin(speed_ms * 300.0 / 6371000.0)" +
      " * cos(radians(track)))), 4) + 0.0 AS pred_lat",
    "round(degrees(radians(lon) + atan2(" +
      "sin(radians(track)) * sin(speed_ms * 300.0 / 6371000.0) * cos(radians(lat)), " +
      "cos(speed_ms * 300.0 / 6371000.0) - sin(radians(lat)) * sin(asin(" +
      "sin(radians(lat)) * cos(speed_ms * 300.0 / 6371000.0)" +
      " + cos(radians(lat)) * sin(speed_ms * 300.0 / 6371000.0)" +
      " * cos(radians(track)))))), 4) + 0.0 AS pred_lon")

  val fnGeoPredict: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      // single-row-group input: the scan is ONE task, so the ~20 trig
      // calls/row below ran single-threaded (guide §2.5 "unsplittable
      // input — repartition immediately after the read"). The spread
      // shuffles 6 narrow columns once and scales with the session's
      // parallelism; on a many-row-group corpus the scan already
      // exceeds it and the exchange is a no-op-sized rebalance
      .repartition(spark.sparkContext.defaultParallelism)
      .selectExpr(Seq("l_orderkey", "l_linenumber") ++ geoExprs: _*)
      .selectExpr(
        Seq("l_orderkey", "l_linenumber") ++ geoPredict: _*)
      .orderBy(
        col("l_orderkey"), col("l_linenumber"),
        col("pred_lat"), col("pred_lon"))

  /** F14: lat/lon box -> region CASE chain (infer_continent analog). */
  private val regionCase =
    """CASE
         WHEN lat BETWEEN 35 AND 72 AND lon BETWEEN -25 AND 65 THEN 'Europe'
         WHEN lat BETWEEN -10 AND 55 AND lon BETWEEN 65 AND 180 THEN 'Asia'
         WHEN lat BETWEEN 7 AND 72 AND lon BETWEEN -168 AND -52 THEN 'North America'
         WHEN lat BETWEEN -56 AND 13 AND lon BETWEEN -82 AND -34 THEN 'South America'
         WHEN lat BETWEEN -35 AND 38 AND lon BETWEEN -18 AND 52 THEN 'Africa'
         WHEN lat BETWEEN -48 AND -10 AND lon BETWEEN 110 AND 180 THEN 'Oceania'
         ELSE 'Other'
       END AS region"""

  val fnCaseRegion: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .selectExpr(
        "event_id",
        "(value % 180.0) - 90.0 AS lat",
        "CAST((user_id * 7) % 360 AS DOUBLE) - 180.0 AS lon")
      .selectExpr("event_id", "lat", "lon", regionCase)
      .orderBy(col("event_id"))

  /** F15: JSON path extraction from the props column. */
  val fnJson: Q = (spark, dir) =>
    Tables(spark, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  /** Spark 4 VARIANT path over the same semi-structured column: parse
    * once into the binary VARIANT encoding, then typed `variant_get`
    * extraction — the lakehouse answer to schemaless JSON at scale
    * (parse cost paid once per row, downstream extractions are
    * navigation over the binary form, not re-parsing; shredding makes
    * them column reads). Aggregated per event_type so the oracle
    * compares the EXTRACTED VALUES' semantics, not the encoding:
    * variant extraction and DuckDB's JSON operator must agree on
    * every row for the sums to hash-match. */
  val fnVariant: Q = (spark, dir) => {
    // Dispatch (round 11): when a committed shredded snapshot of this
    // events source already exists this session (built by
    // q_fn_variant_shredded or an explicit layout job) AND its
    // `_SHRED_PATHS` declaration covers exactly this query's path at
    // this type, serve from the typed column — paying per-row
    // parse_json beside a table that already materialized `$.k` at
    // commit time is the round-10 ledger's honest counterexample
    // (12.1 s vs 0.03 s at x10, all of it re-parsing). The
    // declaration check goes through VersionedTable.shredOutputFor
    // (declared + materialized, not merely declared), so a
    // not-yet-committed declaration still parses. No snapshot → the
    // per-row parse regime, kept addressable as [[fnVariantParse]].
    // Try: a concurrent invalidateShredTableCache() between the peek
    // and the read deletes the table out from under us — the peek
    // contract says a failed use of the value is a MISS, so the race
    // degrades to the parse regime instead of failing the query
    // Fingerprint gate (round-11 advice): the memo records the SOURCE
    // listing identity at build time — a source recommitted/changed
    // since then must MISS the dispatch (stale snapshot), not serve
    // yesterday's rows under today's dir
    val dispatched = freshShredTable(spark, dir).flatMap { table =>
      scala.util.Try {
        graft.engine.VersionedTable
          .shredOutputFor(spark, table, "props", "$.k", "int")
          .map(out => variantAgg(
            graft.engine.VersionedTable.read(spark, table)
              .select(col("event_type"), col(out).as("k"))))
      }.toOption.flatten
    }
    dispatched.getOrElse(fnVariantParse(spark, dir))
  }

  /** The dispatch-side fingerprint gate shared by [[fnVariant]] and
    * [[fnVariantMulti]]: the memoized snapshot, only if its build-time
    * source fingerprint still matches the live source. A STALE entry
    * is dropped here, not just skipped — otherwise a parse-face-only
    * session re-lists and re-misses on every call while the dead
    * snapshot's temp table sits on disk until session end. */
  private def freshShredTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[String] =
    shredTableCache.peek(spark, dir).flatMap { case (table, fp) =>
      if (fp == eventsFingerprint(spark, dir)) Some(table)
      // per-dir eviction, not a full invalidate: only THIS dir's
      // snapshot went stale — a multi-dir session keeps its other
      // still-fresh snapshots (round-12 ADVICE)
      else { shredTableCache.evict(spark, dir); None }
    }

  /** The per-row-parse regime of [[fnVariant]] — the fallback when no
    * shredded snapshot exists, kept addressable so Bench and the
    * regime-equality spec can price/pin it explicitly. */
  private[graft] val fnVariantParse: Q = (spark, dir) =>
    // measured WITHOUT the fnVariantMultiParse spread: the one-path
    // $.k parse is cheap enough that the spread's exchange buys
    // nothing (0.65 s either way at sf0.1) — single-task parse stays
    variantAgg(Tables(spark, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k")))

  /** The shared aggregate over (event_type, k) both variant regimes
    * feed — one body, so the dispatch can never change the answer's
    * shape. */
  private def variantAgg(kd: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    kd.groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** F7: freshness check. The reference compares `now() - max_date`
    * against a threshold (`app.py:126-137`); wall-clock `now()` can't
    * hash-match an oracle, so the engine face measures each source's
    * lag against the dataset's own high-water mark (the streaming
    * watermark analog): per-event-type max(ts) vs global max(ts),
    * thresholded at 1 day. Deterministic, exact in MICROSECONDS
    * (integer arithmetic — no epoch-seconds flooring drift), and the
    * global max is a 1-row broadcast, not a collect. At a real
    * deployment `asOf` is the batch boundary; substituting
    * `current_timestamp()` recovers the reference's literal check. */
  val fnFreshness: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    val global = ev.agg(max(col("ts")).as("as_of"))
    val lagUs = unix_micros(col("as_of")) - unix_micros(col("latest"))
    ev.groupBy(col("event_type")).agg(max(col("ts")).as("latest"))
      .crossJoin(broadcast(global))
      .select(
        col("event_type"),
        col("latest"),
        lagUs.as("lag_us"),
        when(lagUs <= 86400000000L, "fresh").otherwise("stale").as("status"))
      .orderBy(col("event_type"))
  }

  /** Regex + padding + substring surface (masking/extraction idioms a
    * data pipeline needs even though the reference never regexes). */
  val fnRegex: Q = (spark, dir) =>
    Tables(spark, dir, "customer").select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "[0-9]", "x").as("masked"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
      substring(col("c_name"), 1, 8).as("prefix"))
      .orderBy(col("c_custkey"))

  /** Fuzzy entity resolution against a canonical dimension — the
    * standardization step before any join on human-entered names
    * (city/vendor/country strings at ingest): nearest canonical value
    * by Levenshtein edit distance, deterministic tie-break on the
    * candidate string. Here each nation resolves to its nearest OTHER
    * nation, exercising the full pairwise matrix. Scale shape: the
    * canonical dim is small by definition -> broadcast cross product
    * dim x dim (or input x broadcast-dim at ingest), min-distance via
    * one window; the INPUT side streams map-only against the
    * broadcast. Both engines implement classic Levenshtein, so
    * distances agree exactly. */
  val fnFuzzyMatch: Q = (spark, dir) => {
    val nations = Tables(spark, dir, "nation").select(col("n_name"))
    val cand = nations.as("a")
      .crossJoin(broadcast(nations.as("b")))
      .filter(col("a.n_name") =!= col("b.n_name"))
      .select(col("a.n_name").as("name"), col("b.n_name").as("cand"),
        levenshtein(col("a.n_name"), col("b.n_name")).as("dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("name")).orderBy(col("dist"), col("cand"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("name"), col("cand").as("nearest"), col("dist"))
      .orderBy(col("name"))
  }

  /** Memoized shredded-at-rest events table per (session, dir) —
    * the skipTableCache lifecycle idiom: the commit is the one-time
    * layout/maintenance step (declare + re-commit, a nightly job in
    * a real lake); repeat invocations pay only the column read. The
    * value carries the SOURCE FINGERPRINT taken at build time (see
    * [[eventsFingerprint]]) so both the dispatch and the builder can
    * detect a source that changed under the memo. */
  private val shredTableCache =
    new graft.util.TableMemo[(String, String)](
      (_, v) => graft.util.Fs.deleteRecursively(v._1))

  def invalidateShredTableCache(): Unit = shredTableCache.invalidate()

  /** Test seam: the memoized shred table's on-disk location (None
    * when no live entry) — specs use it to prove a stale entry was
    * DROPPED, not merely skipped. */
  private[graft] def shredTablePath(
      spark: org.apache.spark.sql.SparkSession, dir: String): Option[String] =
    shredTableCache.peek(spark, dir).map(_._1)

  /** Identity of the events source under `dir`: every data file's
    * (name, length, mtime), order-independent. One listing RPC — the
    * cost of never serving a stale shredded snapshot after the source
    * is regenerated in-session (round-11 advice). */
  private def eventsFingerprint(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fsys = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fsys.exists(path)) "absent"
    else {
      val it = fsys.listFiles(path, true)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val s = it.next()
        parts += s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
      }
      s"${parts.size}:${parts.sorted.mkString("|").hashCode}"
    }
  }

  private def shreddedEventsTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val fp = eventsFingerprint(spark, dir)
    // a memoized snapshot of a source that has since changed is stale
    // for the BUILD path too, not just the dispatch: drop and rebuild
    if (shredTableCache.peek(spark, dir).exists(_._2 != fp))
      shredTableCache.evict(spark, dir)
    shredTableCache.getOrBuild(spark, dir) {
      val table = graft.util.Fs.tempDir("graft_shred")
      graft.engine.VersionedTable.setShreddedPaths(spark, table, shredDecls)
      graft.engine.VersionedTable.commit(
        Tables(spark, dir, "events").withColumn("doc", expr(nestedDocExpr)),
        table)
      (table, fp)
    }._1
  }

  /** The multi-path + nested declaration set the shredded events
    * snapshot materializes: the original flat `$.k` plus three paths
    * of a NESTED document column (`$.a.b`, `$.a.c`, `$.v`) — one
    * commit extracts all four into typed parquet columns. */
  private val shredDecls = Seq(
    "props|k_shred:$.k:int",
    "doc|ab_shred:$.a.b:int",
    "doc|ac_shred:$.a.c:string",
    "doc|v_shred:$.v:bigint")

  /** Deterministic NESTED semi-structured document derived from the
    * fixture's own columns (the fixture's props is flat `{"k": N}`,
    * so depth is synthesized: in production the nested doc arrives as
    * data). The oracle never parses it — it recomputes the same
    * values from the base columns, so the comparison checks the
    * extraction semantics end to end. */
  private val nestedDocExpr =
    "to_json(named_struct('a', named_struct(" +
      "'b', CAST(get_json_object(props, '$.k') AS INT), " +
      "'c', event_type), 'v', user_id))"

  /** The SHREDDED-AT-REST face of q_fn_variant — the repair for its
    * honest anchor gap (parse_json's binary encode paid per row per
    * query, 12.1 s vs DuckDB 0.03 s at x10): the hot path `$.k` is
    * declared as a table property (`VersionedTable.setShreddedPaths`,
    * the auto-stats idiom) and every commit extracts it into a typed
    * column at write time, so the serve is a two-column read +
    * aggregate — no parse_json, no variant_get, no per-row parsing
    * anywhere in the plan (PlansSpec guards the executed plan).
    * Output is hash-equal to q_fn_variant under the same oracle. */
  val fnVariantShredded: Q = (spark, dir) =>
    variantAgg(graft.engine.VersionedTable.read(spark,
      shreddedEventsTable(spark, dir))
      .select(col("event_type"), col("k_shred").as("k")))

  /** The shared aggregate over the three NESTED extractions both
    * multi-path regimes feed. */
  private def variantMultiAgg(kd: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    kd.groupBy(col("ac"))
      .agg(
        count(col("ab")).as("n_ab"),
        sum(col("ab")).as("sum_ab"),
        max(col("ab")).as("max_ab"),
        sum(col("v")).as("sum_v"))
      .orderBy(col("ac"))

  /** Per-row-parse regime of the multi-path query: ONE parse_json of
    * the nested doc, three typed variant_get extractions. */
  private[graft] val fnVariantMultiParse: Q = (spark, dir) =>
    variantMultiAgg(Tables(spark, dir, "events")
      // spread before the parse (fnVariantParse rationale)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("doc", expr(nestedDocExpr))
      .withColumn("vd", expr("parse_json(doc)"))
      .select(
        expr("variant_get(vd, '$.a.b', 'int')").as("ab"),
        expr("variant_get(vd, '$.a.c', 'string')").as("ac"),
        expr("variant_get(vd, '$.v', 'bigint')").as("v")))

  /** Multi-path + NESTED shredding (round-11 directive #7): the
    * dispatch serves only when EVERY declared extraction this query
    * needs is materialized at the declared type on the committed
    * snapshot — one partially-covering declaration keeps the parse
    * regime, so a dispatched plan is parse-free for ALL its paths
    * (PlansSpec guards the executed plan). Same fingerprint gate as
    * [[fnVariant]]. */
  val fnVariantMulti: Q = (spark, dir) => {
    val dispatched = freshShredTable(spark, dir)
      .flatMap { table =>
        scala.util.Try {
          for {
            ab <- graft.engine.VersionedTable
              .shredOutputFor(spark, table, "doc", "$.a.b", "int")
            ac <- graft.engine.VersionedTable
              .shredOutputFor(spark, table, "doc", "$.a.c", "string")
            v <- graft.engine.VersionedTable
              .shredOutputFor(spark, table, "doc", "$.v", "bigint")
          } yield variantMultiAgg(
            graft.engine.VersionedTable.read(spark, table)
              .select(col(ab).as("ab"), col(ac).as("ac"), col(v).as("v")))
        }.toOption.flatten
      }
    dispatched.getOrElse(fnVariantMultiParse(spark, dir))
  }

  /** The shredded-at-rest face of [[fnVariantMulti]]: builds/serves
    * the committed snapshot whose one commit materialized all four
    * declared paths (flat + three nested) as typed columns. */
  val fnVariantMultiShredded: Q = (spark, dir) =>
    variantMultiAgg(graft.engine.VersionedTable.read(spark,
      shreddedEventsTable(spark, dir))
      .select(col("ab_shred").as("ab"), col("ac_shred").as("ac"),
        col("v_shred").as("v")))

  val queries: Map[String, Q] = Map(
    "q_fn_fuzzy_match" -> fnFuzzyMatch,
    "q_fn_variant" -> fnVariant,
    "q_fn_variant_shredded" -> fnVariantShredded,
    "q_fn_variant_multi" -> fnVariantMulti,
    "q_fn_variant_multi_shredded" -> fnVariantMultiShredded,
    "q_fn_regex" -> fnRegex,
    "q_fn_string" -> fnString,
    "q_fn_ts_from_unix" -> fnTsFromUnix,
    "q_fn_hour" -> fnHour,
    "q_fn_ts_parse" -> fnTsParse,
    "q_fn_date_format" -> fnDateFormat,
    "q_fn_coalesce" -> fnCoalesce,
    "q_fn_clamp" -> fnClamp,
    "q_fn_when" -> fnWhen,
    "q_fn_arith" -> fnArith,
    "q_fn_bucketize" -> fnBucketize,
    "q_fn_geo_predict" -> fnGeoPredict,
    "q_fn_case_region" -> fnCaseRegion,
    "q_fn_json" -> fnJson,
    "q_fn_freshness" -> fnFreshness)

  /** One oracle text for both variant faces: shredding must be
    * invisible in results — same values whether extracted per row at
    * read (q_fn_variant) or once at commit (q_fn_variant_shredded). */
  private val variantOracle =
    """SELECT event_type,
              CAST(count(CAST(props->>'$.k' AS INT)) AS BIGINT) AS n_k,
              CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
              CAST(max(CAST(props->>'$.k' AS INT)) AS INT) AS max_k
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** One oracle for both multi-path faces — the oracle recomputes the
    * nested doc's values from the BASE columns (the doc is derived
    * from them deterministically), so extraction semantics are
    * checked end to end without DuckDB ever seeing the doc. */
  private val variantMultiOracle =
    """SELECT event_type AS ac,
              CAST(count(CAST(props->>'$.k' AS INT)) AS BIGINT) AS n_ab,
              CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_ab,
              CAST(max(CAST(props->>'$.k' AS INT)) AS INT) AS max_ab,
              CAST(sum(user_id) AS BIGINT) AS sum_v
       FROM events GROUP BY event_type ORDER BY ac"""

  val oracle: Map[String, String] = Map(
    "q_fn_variant" -> variantOracle,
    "q_fn_variant_shredded" -> variantOracle,
    "q_fn_variant_multi" -> variantMultiOracle,
    "q_fn_variant_multi_shredded" -> variantMultiOracle,
    "q_fn_fuzzy_match" ->
      """SELECT name, nearest, dist FROM (
           SELECT a.n_name AS name, b.n_name AS nearest,
                  CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist,
                  row_number() OVER (
                    PARTITION BY a.n_name
                    ORDER BY levenshtein(a.n_name, b.n_name), b.n_name) AS rn
           FROM nation a CROSS JOIN nation b
           WHERE a.n_name <> b.n_name)
         WHERE rn = 1 ORDER BY name""",
    "q_fn_freshness" ->
      """WITH g AS (SELECT max(ts) AS as_of FROM events),
              t AS (SELECT event_type, max(ts) AS latest
                    FROM events GROUP BY event_type)
         SELECT t.event_type, t.latest,
                epoch_us(g.as_of) - epoch_us(t.latest) AS lag_us,
                CASE WHEN epoch_us(g.as_of) - epoch_us(t.latest)
                          <= 86400000000 THEN 'fresh' ELSE 'stale' END AS status
         FROM t, g ORDER BY event_type""",
    "q_fn_regex" ->
      """SELECT c_custkey,
                regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked,
                regexp_extract(c_name, '([0-9]+)', 1) AS digits,
                lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
                substring(c_name, 1, 8) AS prefix
         FROM customer ORDER BY c_custkey""",
    "q_fn_string" ->
      """SELECT c_custkey, lower(trim(c_name)) AS name_norm,
                upper(c_mktsegment) AS seg_upper,
                CAST(length(c_name) AS INT) AS name_len
         FROM customer ORDER BY c_custkey""",
    "q_fn_ts_from_unix" ->
      """SELECT event_id,
                CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
                make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS ts_rt
         FROM events ORDER BY event_id""",
    "q_fn_hour" ->
      """SELECT event_id, CAST(hour(ts) AS INT) AS hr,
                CAST(dayofmonth(ts) AS INT) AS dy,
                CAST(month(ts) AS INT) AS mon
         FROM events ORDER BY event_id""",
    "q_fn_ts_parse" ->
      """SELECT event_id,
                strptime(strftime(ts, '%Y%m%d_%H%M%S'), '%Y%m%d_%H%M%S') AS parsed
         FROM events ORDER BY event_id""",
    "q_fn_date_format" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M') AS fmt
         FROM events ORDER BY event_id""",
    "q_fn_coalesce" ->
      """SELECT event_id,
                coalesce(nullif(event_type, 'click'), 'unknown') AS etype_filled
         FROM events ORDER BY event_id""",
    "q_fn_clamp" ->
      """SELECT event_id, least(greatest(value, 10.0), 100.0) AS clamped
         FROM events ORDER BY event_id""",
    "q_fn_when" ->
      """SELECT event_id,
                CASE WHEN value > 100.0 THEN 'high'
                     WHEN value > 10.0 THEN 'mid'
                     ELSE 'low' END AS tier
         FROM events ORDER BY event_id""",
    "q_fn_arith" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net_price
         FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price""",
    "q_fn_bucketize" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice < 1000.0 THEN '0-1k'
                     WHEN o_totalprice < 10000.0 THEN '1k-10k'
                     WHEN o_totalprice < 50000.0 THEN '10k-50k'
                     WHEN o_totalprice < 100000.0 THEN '50k-100k'
                     ELSE '100k+' END AS bucket
         FROM orders ORDER BY o_orderkey""",
    "q_fn_geo_predict" ->
      s"""WITH base AS (
            SELECT l_orderkey, l_linenumber, ${geoExprs.mkString(", ")}
            FROM lineitem)
          SELECT l_orderkey, l_linenumber, ${geoPredict.mkString(", ")}
          FROM base
          ORDER BY l_orderkey, l_linenumber, pred_lat, pred_lon""",
    "q_fn_case_region" ->
      s"""WITH base AS (
            SELECT event_id,
                   (value % 180.0) - 90.0 AS lat,
                   CAST((user_id * 7) % 360 AS DOUBLE) - 180.0 AS lon
            FROM events)
          SELECT event_id, lat, lon, $regionCase
          FROM base ORDER BY event_id""",
    "q_fn_json" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INT) AS k
         FROM events ORDER BY event_id""")
}
