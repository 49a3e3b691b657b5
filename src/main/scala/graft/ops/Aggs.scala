package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Aggregations (SURVEY.md §2.4).
  *
  * Reference behaviors:
  *  - KPI count / conditional count / nunique / min-max
  *    (`services/analytics/app.py:228-239,444-446`);
  *  - "country intelligence" group-by multi-agg + top-10
  *    (`services/analytics/app.py:341-362`) — the flagship query;
  *  - value_counts top-k (`services/dashboard/dashboard.py:173-197`);
  *  - two-key group count (`services/dashboard/dashboard.py:229-233`);
  *  - exact percentile (`services/analytics/app.py:286-287`);
  *  - mode with deterministic tie-break (`services/analytics/app.py:499-511`);
  *  - rollup is the engine's natural extension (subtotals the dashboards
  *    recompute client-side).
  *
  * Scale notes: every group-by here is a Spark hash aggregate with
  * map-side partial aggregation, so the shuffle carries one row per
  * (partition, key), not per input row. Top-k = orderBy+limit compiles to
  * TakeOrderedAndProject (per-partition heaps, no global sort). Exact
  * percentile is a single-pass ImperativeAggregate; at 100 TB swap in
  * `approx_percentile` / `approx_count_distinct` (declared alongside) for
  * the same shape without the exact-sort memory cost.
  */
object Aggs {

  /** A1: global count. */
  val aggCount: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** A2: conditional count (sum of predicate). */
  val aggCountIf: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem").agg(
      sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned_cnt"),
      count(lit(1)).as("total_cnt"))

  /** A3: count distinct (exact; HLL variant is q_agg_approx_distinct). */
  val aggCountDistinct: Q = (spark, dir) =>
    Tables(spark, dir, "orders").agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderpriority")).as("n_prio"))

  /** A4: min / max over doubles and timestamps. */
  val aggMinmax: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem").agg(
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))

  /** A5+T1: flagship "country intelligence" — fact x facts x dims,
    * filter, group per nation, top-10 by count. Dims broadcast. */
  val aggGroupbyMulti: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") =!= "F")
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("flights"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"))
      .orderBy(col("flights").desc, col("n_name"))
      .limit(10)
  }

  /** A6: group-by mean over several columns. */
  val aggGroupbyAvg: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .orderBy(col("l_returnflag"))

  /** A7: value_counts top-k with deterministic tie-break. */
  val aggTopkCounts: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_suppkey"))
      .limit(15)

  /** A8: two-key group count (continent x hour analog). */
  val aggGroupby2: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"), col("hr"))

  /** EXACT percentile computed distributively — bitwise-identical to
    * Spark's `percentile` (the interpolation formula is replicated
    * op-for-op, spec-pinned), but with BOUNDED memory at any scale.
    *
    * Why not the built-in: `percentile` buffers a value->count map of
    * EVERY distinct value into a single final aggregation buffer —
    * the full-suite anchor measured it at 9.5 s on 6M rows (31x the
    * single-node engine), and at 100 TB the buffer itself is the OOM.
    * Here the same result comes from relational algebra that never
    * concentrates the data:
    *   1. reduce to (value, count) — one shuffle, distinct-sized;
    *   2. range-bucket values on approx-quantile split points (a
    *      metadata-sized driver array, the bloom-sketch idiom) and
    *      prefix-sum WITHIN each bucket via a window — each task
    *      sorts only its bucket, spilling, never OOMing;
    *   3. bucket offsets from a buckets-sized (<=33 row) frame;
    *   4. the two order statistics around each target rank fall out
    *      of one conditional aggregate over the cumulative frame, and
    *      the interpolation is Spark's own `(higher - position) *
    *      lowerKey + (position - lower) * higherKey` with its
    *      equal-key and integer-position short-circuits, so the
    *      result hashes identically to the built-in (and therefore
    *      to the DuckDB quantile_cont oracle).
    *
    * Returns one row with columns `p0..p{k-1}` in `ps` order (null on
    * an empty input, like the built-in). The split probe is IN-PLAN
    * (Windows.approxSplitsAgg): all consumers of `counts` ride one
    * action and share its exchange via ReusedExchange — the former
    * eager localCheckpoint + driver approxQuantile cost two extra
    * sequential jobs per call and an executor-storage block. */
  def exactPercentiles(df: DataFrame, valueCol: String,
      ps: Seq[Double], buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Windows.requireSplitProbeConsistency(df.sparkSession)
    val counts = df
      .select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val probe = counts.agg(
      Windows.approxSplitsAgg(col("v"), buckets).as("__splits"))
    // NaN pins to the top bucket — the shared rangeBucketOfArr guard
    // (see its scaladoc for the NaN/NULL ordering rationale)
    val bucketed = counts.crossJoin(broadcast(probe))
      .withColumn("b", Windows.rangeBucketOfArr(col("v"), col("__splits")))
      .drop("__splits")
    val wIn = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed
      .withColumn("cumIn", sum(col("cnt")).over(wIn))
    val btot = bucketed
      .groupBy(col("b")).agg(sum(col("cnt")).as("btot"))
    // <= buckets+1 rows: the unpartitioned window is metadata-sized
    val offs = btot.withColumn("off",
      coalesce(sum(col("btot")).over(Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val nDf = btot.agg(coalesce(sum(col("btot")), lit(0L)).as("n"))
    val cumEnd = cum
      .join(broadcast(offs.select(col("b"), col("off"))), Seq("b"))
      .withColumn("cumEnd", col("off") + col("cumIn"))
      .crossJoin(broadcast(nDf))
    val orderStats = ps.indices.flatMap { i =>
      val pos = lit(ps(i)) * (col("n").cast("double") - 1.0)
      Seq(
        min(when(col("cumEnd") >= floor(pos) + 1, col("v"))).as(s"vLo$i"),
        min(when(col("cumEnd") >= ceil(pos) + 1, col("v"))).as(s"vHi$i"))
    }
    cumEnd
      .agg(max(col("n")).as("n"), orderStats: _*)
      .select(ps.indices.map { i =>
        val pos = lit(ps(i)) * (col("n").cast("double") - 1.0)
        val lower = floor(pos)
        val higher = ceil(pos)
        // Spark Percentile.getPercentile, replicated exactly: the two
        // short-circuits matter because the interpolation on equal
        // keys is NOT bitwise k (ulp drift), and LONG-DOUBLE
        // promotion must happen in the same places
        when(col("n") === 0, lit(null).cast("double"))
          .when(higher === lower, col(s"vLo$i"))
          .when(col(s"vHi$i") === col(s"vLo$i"), col(s"vLo$i"))
          .otherwise((higher - pos) * col(s"vLo$i") +
            (pos - lower) * col(s"vHi$i"))
          .as(s"p$i")
      }: _*)
  }

  /** A9: exact percentile (DuckDB quantile_cont-compatible
    * interpolation), via [[exactPercentiles]] — the distributed form;
    * AggsSpec pins it bitwise to the built-in `percentile`. */
  val aggPercentile: Q = (spark, dir) =>
    exactPercentiles(Tables(spark, dir, "lineitem"),
      "l_extendedprice", Seq(0.5, 0.99))
      .select(round(col("p0"), 4).as("p50"), round(col("p1"), 4).as("p99"))

  /** A3-scale: HLL approx distinct, the 100 TB variant of A3 (not
    * oracle-checked: sketch estimates are engine-specific). */
  val aggApproxDistinct: Q = (spark, dir) =>
    Tables(spark, dir, "orders").agg(
      approx_count_distinct(col("o_custkey")).as("n_cust_approx"))

  /** A3-incremental: MERGEABLE count-distinct via DataSketches HLL —
    * the shape a 100 TB nightly pipeline actually needs. A plain
    * count-distinct (or approx_count_distinct) re-scans the whole
    * history per report; here each day aggregates ONCE into a
    * persistable HLL sketch (`hll_sketch_agg`), and the corpus-wide
    * distinct estimate is a SKETCH UNION over the daily sketches
    * (`hll_union_agg`) — yesterday's data is never re-read, and the
    * union of per-slice sketches is REGISTER-EXACT equal to a single
    * whole-table sketch (max-merge of registers; AggsSpec asserts the
    * estimates match to the bit). Output: days summarized, merged
    * estimate, single-pass estimate, exact count for the error frame.
    * Rows-only: sketch estimates are engine-specific. */
  val aggHllMerge: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.agg(
      count(lit(1)).as("n_days"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
    val whole = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_single"),
      countDistinct(col("user_id")).as("exact"))
    merged.crossJoin(whole)
  }

  /** A9-scale: t-digest approx percentile, the bounded-memory variant
    * of A9 (not oracle-checked: sketch estimates are engine-specific). */
  val aggApproxPercentile: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem").agg(
      expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)")
        .as("p_approx"))

  /** A10: mode with imposed (count DESC, key ASC) tie-break. */
  val aggMode: Q = (spark, dir) =>
    Tables(spark, dir, "part")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("p_brand"))
      .limit(1)
      .select(col("p_brand").as("mode_brand"))

  /** Rollup: nation x order-status counts with subtotals. */
  val aggRollup: Q = (spark, dir) => {
    val orders = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .rollup(col("n_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("n_name"), asc_nulls_first("o_orderstatus"))
  }

  /** Cube: all grouping-set combinations of (status, priority). */
  val aggCube: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(
        asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** TPC-H Q1 (pricing summary report): the canonical pure-aggregate
    * macro — one full-table scan, eight aggregates over four groups,
    * zero joins. The 100 TB shape is all map-side partial aggregation:
    * the shuffle carries 4 groups x 8 partials per task, nothing else,
    * and the date filter reaches the parquet scan.
    *
    * Determinism note: per-row CAST(double-product AS DECIMAL) is NOT
    * cross-engine stable here — Spark and DuckDB round double->decimal
    * ties differently, and with ~95% of lineitem surviving Q1's filter
    * the tie rows actually occur (measured +0.0034 drift at sf0.01).
    * Monetary sums therefore use the driver-green round(sum(double), 2)
    * shape (q_join_inner / reworked q_join_range pattern); q_tpch_q3/q5
    * keep the decimal form over their far sparser row sets. */
  val tpchQ1: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Explicit GROUPING SETS — the general grouping-set form beside
    * rollup and cube: per-status totals, per-priority totals, and the
    * grand total, WITHOUT the cross combinations cube would add. The
    * DataFrame API spells rollup/cube only, so this rides spark.sql
    * over a temp view — still one declarative plan through the same
    * Expand operator. */
  val aggGroupingSets: Q = (spark, dir) => {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_gsets")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders_gsets
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST, cnt""")
  }

  /** Deterministic set aggregation: the set of event types per user,
    * sorted then joined to ONE scalar string — collect_set alone is
    * order-nondeterministic (sort_array fixes that), and an
    * array-typed output column crashes the driver's pandas comparator
    * ("unhashable type"), so the join-to-scalar is what makes the
    * result both reproducible across partitionings AND
    * hash-comparable by the gate. */
  val aggCollectSet: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",")
          .as("types"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** TPC-H Q6 (forecasting revenue change): the selective filter-and-sum
    * macro — the pushdown showcase. All three predicates reach the
    * parquet scan as PushedFilters; what survives is one map-side
    * partial sum per task and a single-row final aggregate. No group
    * keys, no join, no shuffle beyond the 1-row exchange. */
  val tpchQ6: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** Statistical aggregates — stddev/variance (sample), correlation
    * and covariance per group: the descriptive-statistics surface an
    * analytics engine owes beside counts and percentiles. All four
    * are single-pass mergeable moment aggregates (Welford/Chan
    * partial merge — the same partial+final hash-aggregate shape as
    * sum/avg, no extra shuffle). Rounded at 4: both engines merge
    * partials in different orders, and the ~1e-12 relative wobble of
    * parallel moment merging must stay below the comparison grain.
    * Near-zero statistics that round to zero diverge at the
    * REPRESENTATION level across engines: DuckDB's round() preserves
    * the sign bit (emitting -0.0) where Spark emits +0.0 — values
    * equal, hashes different (the round-7 red row). Two defenses:
    * `+ 0.0` after every round() IEEE-canonicalizes -0.0 to +0.0 in
    * both engines, and the covariance pair is (quantity, price) whose
    * covariance is structurally non-degenerate, so the entry tests
    * values rather than signed zeros. */
  val aggStats: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        (round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          + lit(0.0)).as("corr_qty_price"),
        (round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          + lit(0.0)).as("covar_qty_price"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, Q] = Map(
    "q_agg_stats" -> aggStats,
    "q_agg_cube" -> aggCube,
    "q_agg_count" -> aggCount,
    "q_agg_count_if" -> aggCountIf,
    "q_agg_count_distinct" -> aggCountDistinct,
    "q_agg_minmax" -> aggMinmax,
    "q_agg_groupby_multi" -> aggGroupbyMulti,
    "q_agg_groupby_avg" -> aggGroupbyAvg,
    "q_agg_topk_counts" -> aggTopkCounts,
    "q_agg_groupby2" -> aggGroupby2,
    "q_agg_percentile" -> aggPercentile,
    "q_agg_approx_distinct" -> aggApproxDistinct,
    "q_agg_hll_merge" -> aggHllMerge,
    "q_agg_approx_percentile" -> aggApproxPercentile,
    "q_agg_mode" -> aggMode,
    "q_agg_rollup" -> aggRollup,
    "q_tpch_q1" -> tpchQ1,
    "q_tpch_q6" -> tpchQ6,
    "q_agg_grouping_sets" -> aggGroupingSets,
    "q_agg_collect_set" -> aggCollectSet)

  val oracle: Map[String, String] = Map(
    "q_agg_stats" ->
      """SELECT l_returnflag,
                round(stddev_samp(l_quantity), 4) AS sd_qty,
                round(var_samp(l_quantity), 4) AS var_qty,
                round(corr(l_quantity, l_extendedprice), 4) + 0.0
                  AS corr_qty_price,
                round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0
                  AS covar_qty_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""",
    "q_agg_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "q_agg_count_if" ->
      """SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                  AS returned_cnt,
                count(*) AS total_cnt
         FROM lineitem""",
    "q_agg_count_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
                count(DISTINCT o_orderpriority) AS n_prio
         FROM orders""",
    "q_agg_minmax" ->
      """SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
                min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
         FROM lineitem""",
    "q_agg_groupby_multi" ->
      """SELECT n_name, count(*) AS flights,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_quantity), 4) AS avg_qty
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderstatus <> 'F'
         GROUP BY n_name
         ORDER BY flights DESC, n_name LIMIT 10""",
    "q_agg_groupby_avg" ->
      """SELECT l_returnflag,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_discount), 4) AS avg_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_topk_counts" ->
      """SELECT l_suppkey, count(*) AS cnt FROM lineitem
         GROUP BY l_suppkey ORDER BY cnt DESC, l_suppkey LIMIT 15""",
    "q_agg_groupby2" ->
      """SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS cnt
         FROM events GROUP BY event_type, hour(ts)
         ORDER BY event_type, hr""",
    "q_agg_percentile" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
         FROM lineitem""",
    "q_agg_mode" ->
      """SELECT p_brand AS mode_brand FROM part
         GROUP BY p_brand ORDER BY count(*) DESC, p_brand LIMIT 1""",
    "q_agg_rollup" ->
      """SELECT n_name, o_orderstatus, count(*) AS cnt
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(n_name, o_orderstatus)
         ORDER BY n_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""",
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 2)
                  AS sum_disc_price,
                round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                  AS sum_charge,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST, cnt""",
    "q_agg_collect_set" ->
      """SELECT user_id,
                array_to_string(list_sort(array_agg(DISTINCT event_type)), ',')
                  AS types,
                count(*) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""")
}
