package graft

/** Physical-plan regression guards: the scale properties the engine is
  * designed around must survive refactors — filters reach the parquet
  * scan, projections prune the read schema, dims broadcast, top-k
  * avoids global sorts, per-key latest uses the group-limit optimizer.
  */
class PlansSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfSmoke)
      .queryExecution.executedPlan.toString

  /** Formatted explain — the tree string truncates each scan's
    * PushedFilters list to ~100 chars, so filters that sort late in a
    * long list are invisible to `plan()`; the formatted mode prints
    * them in full. */
  private def planFull(name: String): String =
    SparkEntry.queries(name)(spark, sfSmoke)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("flagship joins broadcast every dimension, no shuffle join") {
    val p = plan("q_agg_groupby_multi")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must not global-sort")
  }

  test("range and in-list filters push to the parquet scan") {
    assert(plan("q_filter_between").contains(
      "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,10.0)"))
    assert(plan("q_filter_isin").contains(
      "PushedFilters: [In(o_orderpriority"))
  }

  test("projection prunes the read schema to selected columns") {
    assert(plan("q_project").contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("dedup-latest plans the window group-limit optimization") {
    assert(plan("q_dedup_latest").contains("WindowGroupLimit"))
  }

  test("ordered limit plans TakeOrderedAndProject") {
    assert(plan("q_topk_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("left enrichment stays a broadcast join on the dim side") {
    val p = plan("q_join_left_enrich")
    assert(p.contains("BroadcastHashJoin") && p.contains("BuildRight"), p.take(400))
  }

  test("embed near-dup pairs plan a broadcast nested-loop, never a cartesian shuffle") {
    val p = plan("q_llm_embed_neardup")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"), "pair space must use the broadcast build side")
  }

  test("shredded variant serve: zero per-row JSON parsing, scan pruned to the typed column") {
    // cold build: the guard must hold on the serve plan the memoized
    // table produces from scratch, not whatever an earlier test left
    graft.ops.ScalarFns.invalidateShredTableCache()
    val p = planFull("q_fn_variant_shredded").toLowerCase
    // the whole point of shredding: extraction happened at COMMIT time,
    // so no semi-structured navigation survives anywhere in the serve
    assert(!p.contains("get_json_object"), "serve must not re-parse JSON")
    assert(!p.contains("parse_json"), "serve must not build variants")
    assert(!p.contains("variant_get"), "serve must not navigate variants")
    // ...and the scan reads the typed column, pruning the document away
    assert(p.contains("k_shred:int"), "scan must read the shredded column")
    assert(!p.contains("props"), "the source document column must prune out")
  }

  test("variant dispatch: parses when no shredded snapshot, serves the typed column when one exists, same answer") {
    // regime 1 — no shredded snapshot this session: the plain entry
    // must pay the per-row parse (the honest fallback), visibly
    graft.ops.ScalarFns.invalidateShredTableCache()
    val pParse = planFull("q_fn_variant").toLowerCase
    // the formatted plan prints the static invoke as "parsejson"
    assert(pParse.contains("parsejson") && pParse.contains("variant_get"),
      "with no shredded snapshot the entry must run the parse regime")
    val parsed = SparkEntry.queries("q_fn_variant")(spark, sfSmoke).collect().toSeq
    // build the committed shredded snapshot (the nightly layout job)
    SparkEntry.queries("q_fn_variant_shredded")(spark, sfSmoke).collect()
    // regime 2 — dispatch: the SAME entry now serves the typed column;
    // no semi-structured navigation anywhere in the executed plan
    val pServe = planFull("q_fn_variant").toLowerCase
    assert(!pServe.contains("parsejson") && !pServe.contains("parse_json"),
      "with a covering shred declaration the entry must not build variants")
    assert(!pServe.contains("variant_get"),
      "with a covering shred declaration the entry must not navigate variants")
    assert(!pServe.contains("get_json_object"),
      "with a covering shred declaration the entry must not re-parse JSON")
    val served = SparkEntry.queries("q_fn_variant")(spark, sfSmoke).collect().toSeq
    assert(served == parsed, "dispatch must never change the answer")
    graft.ops.ScalarFns.invalidateShredTableCache()
  }

  test("multi-path nested shred: every declared extraction in one query is parse-free") {
    // regime 1 — no snapshot: the multi entry pays ONE parse of the
    // nested doc and three typed variant_get extractions
    graft.ops.ScalarFns.invalidateShredTableCache()
    val pParse = planFull("q_fn_variant_multi").toLowerCase
    assert(pParse.contains("parsejson") && pParse.contains("variant_get"),
      "with no snapshot the multi entry must run the parse regime")
    val parsed = SparkEntry.queries("q_fn_variant_multi")(spark, sfSmoke)
      .collect().toSeq
    // build the snapshot: ONE commit materializes all four declared
    // paths (flat $.k plus nested $.a.b/$.a.c/$.v) as typed columns
    SparkEntry.queries("q_fn_variant_multi_shredded")(spark, sfSmoke).collect()
    // regime 2 — dispatch: ALL THREE extractions this query needs are
    // column reads; no JSON machinery survives anywhere in the plan
    val pServe = planFull("q_fn_variant_multi").toLowerCase
    for (tok <- Seq("parsejson", "parse_json", "variant_get",
        "get_json_object", "to_json"))
      assert(!pServe.contains(tok),
        s"dispatched multi-path serve must not contain $tok")
    for (colTok <- Seq("ab_shred:int", "ac_shred:string", "v_shred:bigint"))
      assert(pServe.contains(colTok),
        s"scan must read the typed column $colTok")
    assert(!pServe.contains("doc"), "the nested document column must prune out")
    val served = SparkEntry.queries("q_fn_variant_multi")(spark, sfSmoke)
      .collect().toSeq
    assert(served == parsed, "multi-path dispatch must never change the answer")
    // partial coverage keeps the parse regime: the single-path
    // q_fn_variant dispatches off the SAME snapshot (its $.k is also
    // declared), proving one snapshot serves several queries — while
    // a query needing an undeclared path must keep parsing
    val pSingle = planFull("q_fn_variant").toLowerCase
    assert(!pSingle.contains("parsejson") && !pSingle.contains("variant_get"),
      "the covering snapshot must serve the single-path query too")
    graft.ops.ScalarFns.invalidateShredTableCache()
  }

  test("freshness compares against a broadcast 1-row high-water mark") {
    val p = plan("q_fn_freshness")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(400))
  }

  test("sampling is a narrow plan: no exchange before the sample") {
    val p = plan("q_sample")
    assert(p.contains("Sample"), p.take(400))
    // plan text prints top-down: the final orderBy's range exchange
    // sits ABOVE the sample; below the sample (between it and the
    // scan) there must be no exchange — the sample thins partitions
    // locally on top of the scan
    assert(p.indexOf("Sample") < p.indexOf("Scan parquet"), p.take(400))
    assert(!p.substring(p.indexOf("Sample")).contains("Exchange"),
      "sample must sit directly on the scan with no shuffle below it")
  }

  test("simhash signatures aggregate in a codegen'd hash aggregate") {
    val p = plan("q_llm_dedup_simhash")
    assert(p.contains("HashAggregate"), p.take(400))
    assert(!p.contains("ArrayAggregate"),
      "the nested-HOF (CodegenFallback) signature form must not come back")
  }

  test("decontamination joins the corpus against a BROADCAST eval-gram set") {
    val p = plan("q_llm_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"),
      "the eval set is tiny by nature; the corpus side must stream map-only")
  }

  test("corpus mix is map-only up to the final per-source rollup") {
    val p = plan("q_llm_corpus_mix")
    // exactly one aggregation exchange (plus AQE's final-sort exchange
    // for the 20-row ORDER BY) — the hash-bucket keep decision must
    // not itself shuffle. Counted, not contains(): any plan with the
    // final rollup trivially contains a HashAggregate
    assert(p.contains("HashAggregate"), p.take(400))
    assert("Exchange".r.findAllIn(p).size <= 2,
      "keep decision must not add exchanges beyond agg + final sort:\n" +
        p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      "membership is per-row hash arithmetic, no join or window")
  }

  test("chunk dedup resolves first-occurrence in ONE window, no join-back") {
    val p = plan("q_llm_chunk_dedup")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "total/kept/rebuilt must all ride the single post-window aggregation")
  }

  test("binned range join plans a HASH join, not a nested loop") {
    val p = plan("q_join_range")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the bin key must make the containment join hashable")
  }

  test("salted join honors the shuffle-hash hint (the no-broadcast regime)") {
    val p = plan("q_join_salted")
    assert(p.contains("ShuffledHashJoin"), p.take(400))
  }

  test("TPC-H Q3 broadcasts the dim, pushes date filters, top-10 without global sort") {
    val p = plan("q_tpch_q3")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(p.contains("TakeOrderedAndProject"), "LIMIT 10 must not global-sort")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      "the shipdate filter must reach the lineitem scan")
  }

  test("TPC-H Q5 keeps all four dims broadcast; no cartesian anywhere") {
    val p = plan("q_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
    // the ONLY shuffle join allowed is fact x fact (lineitem x orders)
    assert(p.sliding("SortMergeJoin".length).count(_ == "SortMergeJoin") <= 1,
      "dims must broadcast, not shuffle")
  }

  test("quality-LR scoring join broadcasts the trained vocab weights") {
    val p = plan("q_llm_quality_lr")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("stream-stream join face keys on user_id (hashable), never a nested loop") {
    val p = plan("q_stream_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(400))
  }

  test("semdedup pair space is keyed by cell, never corpus x corpus") {
    val p = plan("q_llm_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("substring islands build joins on the gram digest, never doc x doc") {
    // the shared upstream both substr ops memoize: guard the BUILD
    // plan (the per-query plans read the written island table)
    val p = graft.ops.Llm.substrIslandSummary(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
    // the run-merge window must partition by (pair, delta), which only
    // exists AFTER the gram-keyed join
    assert(p.contains("Window"), p.take(400))
  }

  test("substring dedup and removal share the memoized island table") {
    graft.ops.Llm.invalidateIslandsCache()
    val p = plan("q_llm_dedup_substr")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
    // past the memo, detection is scan + two aggregates — the islands
    // window must NOT re-run per query
    assert(!p.contains("Window"), p.take(400))
    val rm = plan("q_llm_dedup_substr_rm")
    // the span excision is an ANTI join of tokens against spans keyed
    // by doc — pair spaces never reach a shuffle
    assert(rm.contains("LeftAnti"), rm.take(400))
    assert(!rm.contains("CartesianProduct") && !rm.contains("BroadcastNestedLoopJoin"),
      rm.take(400))
  }

  test("tpch q18: the having-side aggregate gates the join as a semi-join build; top-100 never global-sorts") {
    val p = plan("q_tpch_q18")
    assert(p.contains("LeftSemi"), p.take(600))
    // the build side of that semi join is the FILTERED aggregate —
    // agg-as-filter, the shape AQE upgrades to a runtime broadcast
    // once the key list's actual (tiny) size is known. The gate is a
    // Filter line over the aggregate's sq output — a bare
    // contains("sq") matches any alias containing those letters
    assert(p.contains("HashAggregate"), p.take(600))
    assert(p.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("sq#")),
      "the having gate must FILTER the aggregate's sq output:\n" +
        p.take(600))
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must not global-sort: " + p.take(600))
    assert(p.contains("BroadcastHashJoin"),
      "customer dim must broadcast: " + p.take(600))
  }

  test("tpch q13: the class filter pushes to the orders scan; the outer join never degenerates") {
    val p = plan("q_tpch_q13")
    // the exclusion filter lives in the join condition semantically,
    // but because the fact is filtered BEFORE the outer join it must
    // reach the parquet scan
    assert(p.contains("Not(EqualTo(o_orderpriority"), p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q10: returnflag+quarter filters push to the scans; top-20 never global-sorts") {
    val p = plan("q_tpch_q10")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter must reach the lineitem scan: " + p.take(600))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "quarter filter must reach the orders scan: " + p.take(600))
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must not global-sort: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q14: part dim broadcasts; the conditional ratio is ONE aggregate pass") {
    val p = plan("q_tpch_q14")
    assert(p.contains("BroadcastHashJoin"),
      "part dim must broadcast: " + p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "fact side must not shuffle for the join: " + p.take(600))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "month filter must reach the lineitem scan: " + p.take(600))
    // both sums + the CASE fold into one partial/final aggregate pair
    assert("HashAggregate".r.findAllIn(p).length == 2,
      "two sums must be one aggregate pass: " + p.take(600))
  }

  test("tpch q15: one fact scan feeds both the revenue view and its max; supplier broadcasts") {
    val p = plan("q_tpch_q15")
    assert("Scan parquet".r.findAllIn(p).count(_ => true) == 2,
      "lineitem must be scanned ONCE (plus the supplier dim): " + p.take(600))
    assert(p.contains("Window"), "the max must ride a window, not a second scan")
    assert(p.contains("BroadcastHashJoin"), "supplier dim must broadcast: " + p.take(400))
  }

  test("tpch q17: brand filter pushes to the part scan; per-part avg is a window, not a self-join") {
    val p = plan("q_tpch_q17")
    assert(p.contains("EqualTo(p_brand,Brand#13)"),
      "brand filter must reach the part scan: " + p.take(600))
    assert("Scan parquet".r.findAllIn(p).count(_ => true) == 2,
      "lineitem must be scanned ONCE — the correlated subquery must not become a self-join: " + p.take(600))
    assert(p.contains("Window"), p.take(400))
    assert(p.contains("BroadcastHashJoin"), "filtered part must broadcast: " + p.take(400))
  }

  test("tpch q19: derived envelopes push to both scans; the cross-side OR is a join residual") {
    val p = plan("q_tpch_q19")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      p.contains("LessThanOrEqual(l_quantity,40.0)"),
      "quantity envelope must reach the lineitem scan: " + p.take(600))
    assert(p.contains("Or(And(EqualTo(p_brand,Brand#1)"),
      "part disjunction must reach the part scan: " + p.take(600))
    assert(p.contains("BroadcastHashJoin"),
      "equi-key + OR residual must stay a broadcast hash join: " + p.take(400))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q22: recency filter pushes to the orders scan; exclusion is an anti join") {
    val p = plan("q_tpch_q22")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "recency filter must reach the orders scan: " + p.take(600))
    assert(p.contains("LeftAnti"), "exclusion must plan as an anti join: " + p.take(400))
    assert(p.contains("In(c_mktsegment"),
      "segment filter must reach the customer scan: " + p.take(600))
  }

  test("tpch q4: existence test plans a LEFT SEMI; both filters push to the scans") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"),
      "EXISTS must plan as a semi join — one probe per order: " + p.take(600))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "quarter filter must reach the orders scan: " + p.take(600))
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "flag filter must reach the lineitem scan: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q21: ONE lineitem scan; both existence tests are window flags; top-100 never global-sorts") {
    val p = plan("q_tpch_q21")
    assert("Scan parquet".r.findAllIn(p).count(_ => true) == 3,
      "lineitem must be scanned ONCE (plus orders + supplier) — the EXISTS/NOT EXISTS " +
        "must not become self-joins: " + p.take(800))
    assert(p.contains("Window"),
      "existence tests must ride windows over the reduced per-(order,supplier) table: " +
        p.take(600))
    assert(p.contains("LeftSemi"),
      "the 'F'-status gate must plan as a semi join: " + p.take(600))
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must not global-sort: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q7: nation-pair envelopes prune both dim scans; ship window pushes to the fact") {
    val p = plan("q_tpch_q7")
    assert(p.contains("In(n_name"),
      "pair filter must reach the nation scans: " + p.take(600))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "two-year window must reach the lineitem scan: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q8: class+region filters push; region gate is a semi join; ONE aggregate pass") {
    val p = plan("q_tpch_q8")
    assert(p.contains("EqualTo(p_type,STANDARD)"),
      "part-class filter must reach the part scan: " + p.take(600))
    assert(p.contains("LeftSemi"),
      "customer-region gate must plan as a semi join: " + p.take(600))
    assert("HashAggregate".r.findAllIn(p).length == 2,
      "both share sums must be one partial/final aggregate pair: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q12: flag+year filters push to the fact; both counts are ONE aggregate pass") {
    val p = planFull("q_tpch_q12")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "flag filter must reach the lineitem scan: " + p.take(600))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "year window must reach the lineitem scan: " + p.take(600))
    // formatted mode names each node twice (tree + detail section):
    // count the numbered tree labels only
    assert("HashAggregate \\(\\d+\\)".r.findAllIn(p).length == 2,
      "high/low counts must be one partial/final aggregate pair: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q2: type filter pushes; correlated min is a window over ONE surrogate build; top-100 never global-sorts") {
    val p = plan("q_tpch_q2")
    assert(p.contains("EqualTo(p_type,ECONOMY)"),
      "part-type filter must reach the part scan: " + p.take(600))
    assert("Scan parquet".r.findAllIn(p).count(_ => true) == 5,
      "lineitem must be scanned ONCE (plus part/supplier/nation/region) — " +
        "the correlated min must not rebuild the surrogate: " + p.take(800))
    assert(p.contains("Window"),
      "the per-part min must be a window, not a self-join: " + p.take(600))
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must not global-sort: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q9: name filter pushes to the part scan; ONE aggregate pass over the join tree") {
    val p = plan("q_tpch_q9")
    assert(p.contains("StringContains(p_name,red)"),
      "name filter must reach the part scan: " + p.take(600))
    assert("Scan parquet".r.findAllIn(p).count(_ => true) == 5,
      "each of the 5 relations must be scanned exactly once: " + p.take(800))
    assert("HashAggregate".r.findAllIn(p).length == 2,
      "profit must be one partial/final aggregate pair: " + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q11: region gate is a semi join below the aggregate; the global total REUSES the per-part exchange") {
    // the reuse is an AQE runtime decision — execute, then read the
    // final adaptive plan
    val df = SparkEntry.queries("q_tpch_q11")(spark, sfSmoke)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(200))
    assert(p.contains("LeftSemi"),
      "region gate must plan as a semi join pushed below the aggregate: " +
        p.take(600))
    assert(p.contains("ReusedExchange"),
      "the scalar total must reuse the per-part aggregate's shuffle — " +
        "scanning the fact twice flunks the 100 TB bar: " + p.take(800))
  }

  test("tpch q16: size in-list pushes; blacklist is a broadcast anti join; distinct count is its own two-phase aggregate") {
    val p = planFull("q_tpch_q16")
    assert(p.contains("In(p_size"),
      "size in-list must reach the part scan: " + p.take(800))
    assert(p.contains("LeftAnti"),
      "the supplier blacklist must plan as an anti join: " + p.take(600))
    assert(p.contains("BroadcastHashJoin"),
      "blacklist and part dims must broadcast: " + p.take(400))
    assert(p.toLowerCase.contains("distinct"),
      "supplier_cnt must be a distinct aggregate: " + p.take(400))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("tpch q20: name prefix pushes; both quantity sums are ONE pass; the qualifying set gates via BROADCAST semi join") {
    val p = planFull("q_tpch_q20")
    assert(p.contains("StringStartsWith(p_name,red)"),
      "name prefix must reach the part scan: " + p.take(800))
    assert("HashAggregate \\(\\d+\\)".r.findAllIn(p).length == 2,
      "qty96/qty_all must be one partial/final aggregate pair: " + p.take(600))
    val tree = plan("q_tpch_q20")
    assert(tree.contains("BroadcastHashJoin") && tree.contains("LeftSemi") &&
      !tree.contains("SortMergeJoin"),
      "the supplier gate must be a broadcast semi join — the qualifying " +
        "set is bounded by |supplier|: " + tree.take(600))
    assert(!tree.contains("CartesianProduct") && !tree.contains("BroadcastNestedLoopJoin"),
      tree.take(400))
  }

  test("prep e2e macro: eval grams broadcast, no cartesian, every corpus window partitioned") {
    val p = plan("q_llm_prep_e2e")
    assert(!p.contains("CartesianProduct"), "no all-pairs shape anywhere")
    // the decontamination stage must filter the corpus-sized gram
    // stream against a BROADCAST eval-gram set (the decontaminate
    // rule) — a shuffled gram join would be a corpus-keyed exchange
    // the macro's scale story forbids
    assert(p.contains("BroadcastHashJoin"),
      "eval gram set must broadcast:\n" + p.take(600))
    // both corpus-sized windows (sha256 dedup, shard row_number)
    // must PARTITION; the only partition-less window allowed is the
    // 256-row bucket-offsets cumsum (the q_llm_shard rule)
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(p).map(_.group(1).trim).toSeq
    def isOrderEntry(s: String) = s.contains(" ASC") || s.contains(" DESC")
    assert(specs.nonEmpty, "expected window nodes in:\n" + p.take(600))
    assert(specs.count(isOrderEntry) <= 1,
      s"at most the offsets cumsum may be partition-less: $specs")
  }

  test("url curation: host extract is scan+project; blocklist anti join broadcasts; cap is one window") {
    val host = plan("q_llm_url_host")
    assert(!host.contains("Join") && !host.contains("HashAggregate"),
      "host extraction must be a pure projection: " + host.take(400))
    val block = plan("q_llm_url_blocklist")
    assert(block.contains("BroadcastHashJoin") && block.contains("LeftAnti"),
      "the dimension-sized blocklist must broadcast: " + block.take(400))
    val cap = plan("q_llm_domain_cap")
    // salted two-phase: local (domain, salt) top-K then global re-rank —
    // TWO LOGICAL window group-limits, so no reducer ever holds a whole
    // domain. Spark plans each logical group-limit as a Partial+Final
    // PHYSICAL pair, so the regressed single-window form still prints
    // TWO WindowGroupLimit nodes — the two-phase shape is >= 4
    // (measured: salted plan 4, regressed plan 2; a >= 2 gate passed
    // the exact regression this test documents itself as preventing)
    assert("WindowGroupLimit".r.findAllIn(cap).size >= 4,
      "expected both cap phases to plan Partial+Final group-limits: " +
        cap.take(600))
    assert(!cap.contains("Join"), "per-domain cap needs no join: " + cap.take(400))
  }

  test("phash candidates come from the band join, never image x image") {
    val p = plan("q_mm_phash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
    val c = plan("q_mm_phash_classes")
    assert(!c.contains("CartesianProduct") && !c.contains("BroadcastNestedLoopJoin"),
      c.take(400))
  }

  test("bigram LM scoring joins stay gram-keyed; only the vocab constant broadcasts") {
    val p = plan("q_llm_lm_score")
    assert(!p.contains("CartesianProduct"), p.take(400))
    // exactly one nested-loop join is legitimate: the broadcast 1-row
    // vocab-size frame; the count/scoring joins must be hash-keyed
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 1, p.take(600))
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the planted-skew join; the salted form matches it row-for-row") {
    import org.apache.spark.sql.functions._
    // one user carrying ~20% of all events — the shape q_join_salted
    // prevents and AQE's skew split repairs after the fact. Executed
    // (not planned) assertions: OptimizeSkewedJoin only matches
    // SMJ(sort(shuffle), sort(shuffle)) and can only split at
    // MAP-chunk boundaries, hence the plain-join inputs, lowered
    // thresholds, and the 16-way round-robin repartition standing in
    // for a 100 TB scan's thousands of map tasks. sf0.01: the hot key
    // needs enough bytes to cross even a lowered split threshold.
    val sfMid = "/root/testdata/sf0.01"
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB") {
      // HALF the users collapse onto user 10: at spec scale the hot
      // partition must clear BOTH the 2x-median factor and the byte
      // threshold, and a 20% hot share over few reducers leaves the
      // median too fat to double (AQE then merely coalesces). The
      // x10/x30 ScaleProbe section measures the gentler 20% shape.
      val ev = graft.engine.Tables(spark, sfMid, "events")
        .withColumn("user_id",
          when(col("user_id") % 2 === 0, lit(10L)).otherwise(col("user_id")))
        .repartition(16)
      val dim = graft.engine.Tables(spark, sfMid, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      def agg(j: org.apache.spark.sql.DataFrame) = j
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("event_type"))
      val unsalted = agg(ev.join(dim, Seq("user_id")))
      val got = unsalted.collect()
      val p = unsalted.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(300))
      assert(p.contains("skew=true"),
        "AQE skew split must engage on the planted hot key:\n" + p.take(800))
      // the hand-salted form: same rows, and no oversized partition
      // for AQE to split — the spread never forms
      val s = 8
      val sf = ev.withColumn("salt", pmod(col("event_id"), lit(s)).cast("int"))
      val sd = dim.withColumn("salt", explode(sequence(lit(0), lit(s - 1))))
      val salted = agg(sf.join(sd.hint("shuffle_hash"), Seq("user_id", "salt")))
      val got2 = salted.collect()
      assert(got.map(_.toString).toSeq == got2.map(_.toString).toSeq,
        "salted join must be result-identical to the plain join")
      // the salted form keys the shuffle on (user_id, salt) through
      // the shuffle-hash hint — the preventive spread. (Under this
      // test's deliberately hair-trigger thresholds AQE may still
      // trim the salted partitions too; the production claim is the
      // key spread + result identity, not that AQE goes idle.)
      val sp = salted.queryExecution.executedPlan.toString
      assert(sp.contains("ShuffledHashJoin"), sp.take(400))
      assert(sp.contains("salt"), "join keys must carry the salt")
    }
  }

  test("AQE converts a planned shuffle join to broadcast once runtime stats shrink the dim") {
    import org.apache.spark.sql.functions._
    // the 100 TB situation: static stats can't see through a selective
    // filter, so the planner schedules a shuffle join — AQE re-plans to
    // broadcast at runtime from the REAL post-filter size. Static
    // broadcast is disabled while the adaptive threshold stays on
    // (explicitly: the adaptive threshold DEFAULTS to the static one,
    // which would silently disable the conversion too).
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB") {
      val fact = graft.engine.Tables(spark, sfSmoke, "lineitem")
      val dim = graft.engine.Tables(spark, sfSmoke, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val q = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(300))
      assert(p.contains("BroadcastHashJoin"),
        "AQE must have converted the shuffle join to broadcast:\n" + p.take(800))
    }
  }

  test("runtime bloom filter: a selective dim side injects might_contain into the fact scan") {
    import org.apache.spark.sql.functions._
    // semi-join reduction: before shuffling the (huge) fact side, a
    // bloom filter built from the filtered dim's join keys drops
    // non-matching fact rows at the scan. Size thresholds are lowered
    // to fixture scale; the mechanism is what runs at 100 TB with the
    // 10 MB / 10 GB defaults.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val fact = graft.engine.Tables(spark, sfSmoke, "lineitem")
      val dim = graft.engine.Tables(spark, sfSmoke, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val q = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .agg(count(lit(1)).as("cnt"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        "runtime bloom filter must be injected on the fact side:\n" +
          optimized.take(800))
    }
  }

  test("bloom decontamination: sketch probe prefilters the corpus below a shuffle confirm join") {
    val p = plan("q_llm_decontam_bloom")
    // the corpus side must carry the sketch probe as a plain Filter
    // (map-only, zero shuffle) feeding the exact confirm join
    assert(p.contains("bloom_might_contain"),
      "corpus scan must be prefiltered by the bloom sketch probe:\n" + p.take(800))
    // the confirm join deliberately does NOT broadcast the eval-gram
    // relation — the whole point of the sketch is that the reference
    // set is too big to broadcast exactly
    assert(p.contains("ShuffledHashJoin"),
      "confirm join must honor the shuffle_hash hint:\n" + p.take(800))
    val filterLine = p.linesIterator.find(l =>
      l.contains("Filter") && l.contains("bloom_might_contain"))
    assert(filterLine.isDefined,
      "bloom probe must be a Filter operator, not a join condition")
  }

  test("curation pipeline: one dedup window, map-only stage flags, no cartesian") {
    val p = plan("q_llm_curate_pipeline")
    // the only corpus-keyed shuffle is the sha256 dedup window —
    // exactly one Window operator in the whole composed plan
    val windows = p.linesIterator.count(_.matches(".*\\bWindow \\[row_number.*"))
    assert(windows == 1, s"exactly ONE dedup window expected, got $windows:\n" +
      p.take(600))
    // stage gates compose as filters/flags, never as pair-space joins
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "stage composition must stay keyed:\n" + p.take(600))
    // both corpus branches keep their scans pruned to the used columns
    assert(!p.contains("lang:"), "unused columns must be pruned from the scans")
  }

  test("semantic decontamination: one-row eval broadcast, corpus never hash-shuffles") {
    val p = plan("q_llm_decontam_semantic")
    // the eval set collapses to ONE collected row and broadcasts — a
    // 1-row build BNLJ is the intended (and safe) join shape here
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
    // the corpus side is map-only: its only exchanges are the eval
    // row's single-partition collect and the presentation range sort
    assert(!p.contains("Exchange hashpartitioning"),
      "corpus must not hash-shuffle:\n" + p.take(600))
  }

  test("dynamic partition pruning: partitioned fact scan takes a runtime dim filter") {
    import org.apache.spark.sql.functions._
    // date-partitioned fact (the silver-zone layout) joined on the
    // partition column against a selectively-filtered dim: the fact
    // scan must receive a DYNAMIC partition filter derived from the
    // dim at runtime — at 100 TB this prunes the lake down to the
    // dim's dates before any fact IO happens
    val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.engine.Tables(spark, sfSmoke, "events")
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val fact = spark.read.parquet(out)
    val dates = fact.select(col("event_date")).distinct()
      .orderBy(col("event_date")).limit(2)
      .collect().map(_.getDate(0).toString)
    import spark.implicits._
    val dim = fact.select(col("event_date")).distinct()
      .withColumn("tag",
        when(col("event_date").isin(dates.toIndexedSeq: _*), "keep")
          .otherwise("drop"))
    val q = fact.join(dim.filter(col("tag") === "keep"), Seq("event_date"))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("cnt"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      "fact scan must carry a dynamicpruning partition filter:\n" + p.take(800))
  }

  test("sequence packing windows per source and aggregates in place") {
    val p = plan("q_llm_pack")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "packing is window + aggregate, no join")
  }

  test("MERGE matrix plans one outer key join, no cartesian") {
    val p = plan("q_merge_matrix")
    assert(p.toLowerCase.contains("fullouter"),
      "merge resolves through one full-outer key join:\n" + p.take(600))
    assert(!p.contains("CartesianProduct"),
      "the 1-row ambiguity count must broadcast, never cartesian-shuffle")
    // exactly one join carries the merge; the only other joins are the
    // broadcast ambiguity probe (semi) + the 1-row count attach
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "ambiguity count attaches via broadcast")
  }

  test("batch kNN join broadcasts the query side; IVF face joins by cell, no cartesian") {
    val p = plan("q_llm_knn_join")
    assert(p.contains("BroadcastNestedLoopJoin"), // eval-sized query side
      "query table must broadcast:\n" + p.take(600))
    assert(!p.contains("CartesianProduct"), "no all-pairs shuffle")
    // the per-query top-k must plan the two-phase group-limit: a
    // PARTIAL WindowGroupLimit thins each scored partition to k rows
    // BEFORE the qid shuffle, so the exchange carries |Q| x k x
    // partitions rows, never the full scored stream. One logical
    // group-limit plans as a Partial+Final PAIR (the domain-cap
    // lesson: a bare "Window" contains-check passes the regressed
    // no-group-limit shape where the shuffle carries everything)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "top-k must plan Partial+Final group-limits:\n" + p.take(600))
    val pi = plan("q_llm_knn_join_ivf")
    assert(!pi.contains("CartesianProduct"),
      "probed join must key on cell:\n" + pi.take(600))
    // ONE nested-loop join is legitimate (queries x broadcast
    // centroids); a second would mean the cell-keyed corpus equi join
    // degraded to a whole-corpus broadcast loop — the all-pairs shape
    // the IVF path exists to avoid, invisible to the cartesian check
    assert("BroadcastNestedLoopJoin".r.findAllIn(pi).size <= 1,
      "corpus join must stay cell-keyed, not nested-loop:\n" + pi.take(600))
    assert(pi.contains("BroadcastHashJoin") || pi.contains("SortMergeJoin"),
      "probe-to-corpus must be an equi join on cell:\n" + pi.take(600))
    // same two-phase rule for the IVF face's per-query top-k: the
    // partial group-limit must thin the probed-cell scored stream
    // before the qid exchange
    assert("WindowGroupLimit".r.findAllIn(pi).size >= 2,
      "IVF top-k must plan Partial+Final group-limits:\n" + pi.take(600))
  }

  test("edit-distance top-k cap plans Partial+Final group-limits, no all-pairs shape") {
    val p = plan("q_join_editdist2_topk")
    assert(!p.contains("CartesianProduct"),
      "candidates must come from the gram-bucket join:\n" + p.take(600))
    // the output cap must thin map-side BEFORE the qid exchange — one
    // logical group-limit plans as the Partial+Final pair (the kNN
    // guard rule); a bare Window would ship every dense-neighborhood
    // pair through the shuffle, exactly what the cap exists to bound
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "per-row cap must plan Partial+Final group-limits:\n" + p.take(600))
    // the banded approximate face obeys the same two rules: candidates
    // from band-bucket equi-joins (never all-pairs), ranked through
    // the same map-side-thinned cap
    val pb = plan("q_join_editdist2_topk_banded")
    assert(!pb.contains("CartesianProduct"),
      "banded candidates must come from bucket equi-joins:\n" + pb.take(600))
    assert("WindowGroupLimit".r.findAllIn(pb).size >= 2,
      "banded cap must plan Partial+Final group-limits:\n" + pb.take(600))
  }

  test("shard assignment plans bucketed windows, no single-ordering global sort") {
    val p = plan("q_llm_shard")
    // the de-concentration property, asserted on the WINDOW SPECS
    // (a bare substring check on the column name passes even after a
    // regression to a one-task global row_number): the corpus-sized
    // window must PARTITION by the hash bucket, and the only
    // partition-less window allowed is the one over the 256-row
    // offsets frame.
    // a windowspecdefinition's args lead with the PARTITION columns;
    // a partition-less window's first arg is an ORDER entry instead,
    // recognizable by its ASC/DESC direction — so "partitioned by the
    // bucket" = first arg is a bare __b reference, NOT "__b ASC ..."
    // (the offsets cumsum ORDERS by __b without partitioning, and a
    // first-arg prefix test alone cannot tell the two apart)
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(p).map(_.group(1).trim).toSeq
    def isOrderEntry(s: String) = s.contains(" ASC") || s.contains(" DESC")
    assert(specs.nonEmpty, "expected window nodes in:\n" + p.take(600))
    assert(specs.exists(s => s.startsWith("__b") && !isOrderEntry(s)),
      s"the corpus window must PARTITION by the hash bucket: $specs")
    // exactly one partition-less window (the bucket-offsets cumsum)
    assert(specs.count(isOrderEntry) <= 1,
      s"more than one partition-less window: $specs")
    assert(!p.contains("CartesianProduct"))
  }

  test("cell-bucketed embed neardup keys pairs by cell, never corpus x corpus") {
    val p = Llm4Plans.forcedScale(spark, sfSmoke)
    assert(p.contains("pcell"), "pair join must key on the probed cell:\n" +
      p.take(600))
    assert(!p.contains("CartesianProduct"), "no all-pairs fallback")
  }
}

/** Helper giving PlansSpec a handle on the forced-scale path's plan
  * without exporting more Llm internals. */
private object Llm4Plans {
  def forcedScale(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ops.Llm.queries("q_llm_embed_neardup_scale_forced")(spark, dir)
      .queryExecution.executedPlan.toString
}
