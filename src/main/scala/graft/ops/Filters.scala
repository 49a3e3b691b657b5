package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Projections / filters / predicates (SURVEY.md §2.2).
  *
  * Reference behaviors:
  *  - column projection (`services/consumer/consumer.py:34`,
  *    `services/analytics/app.py:297,306`);
  *  - membership / boolean / between / compound-OR / null filters
  *    (`services/analytics/app.py:215-226,317-325`,
  *    `services/dashboard/dashboard.py:68`);
  *  - 99th-percentile outlier threshold (`services/analytics/app.py:283-310`);
  *  - dedup-by-latest (`services/producer/producer.py:84-96`).
  *
  * Scale notes: all predicates are plain Catalyst expressions, so they
  * push to the parquet scan (check `PushedFilters` in explain). The
  * quantile threshold is a 1-row aggregate broadcast back over the fact
  * table — no driver-side collect, no second full materialization. The
  * dedup is a single hash-partitioned window (one shuffle on the key),
  * exactly what `dropDuplicates` would plan, but with a deterministic
  * tie-break.
  */
object Filters {

  /** P1: column projection. */
  val project: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** P3: membership (IN-list) filter. */
  val filterIsin: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** P4: boolean equality filter (airborne analog). */
  val filterBool: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .withColumn("is_big", col("value") > 100.0)
      .filter(col("is_big") === false)
      .select(col("event_id"), col("value"), col("is_big"))
      .orderBy(col("event_id"))

  /** P5: coalesce + between range filter (altitude-band analog).
    * The reference's `fillna(0).between(10, 20)` is written in its
    * sargable form — 0 is outside the band, so `coalesce(x, 0) BETWEEN`
    * equals a plain BETWEEN (null -> false), and the plain predicate
    * pushes to the parquet scan (row-group stats pruning at scale)
    * while the coalesce-wrapped one cannot. */
  val filterBetween: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(col("l_quantity").between(10.0, 20.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** P6: compound AND/OR/IS NULL predicate (suspicious-flight analog,
    * app.py:317-325). */
  val filterCompound: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(
        col("l_returnflag") === "R" &&
          (col("l_quantity") < 3.0 ||
            col("l_discount") > 0.09 ||
            col("l_shipdate").isNull))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"))

  /** P7: null-dropping (`dropna(subset=...)`). Note Spark's na.drop also
    * drops NaN for double columns; the fixtures carry no NaN so the SQL
    * IS NOT NULL oracle is equivalent. */
  val filterNotnull: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .na.drop(Seq("value", "props"))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  /** P8/M4: quantile-threshold outlier filter. The exact percentile is a
    * one-row agg joined back by broadcast — distributed end to end. */
  val filterQuantile: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    // distributed exact p99 (Aggs.exactPercentiles): bitwise equal to
    // the built-in `percentile` without its single-buffer value map —
    // the anchor measured the built-in at 9.5 s on 6M rows
    val threshold = Aggs.exactPercentiles(li, "l_extendedprice", Seq(0.99))
      .select(col("p0").as("p99"))
    li.join(broadcast(threshold))
      .filter(col("l_extendedprice") >= col("p99"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }

  /** P9/W1: dedup by latest per key with deterministic tie-break
    * (producer.py:84-96 in-memory `last_seen` dict, re-expressed as a
    * single shuffle + per-partition window). */
  val dedupLatest: Q = (spark, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_project" -> project,
    "q_filter_isin" -> filterIsin,
    "q_filter_bool" -> filterBool,
    "q_filter_between" -> filterBetween,
    "q_filter_compound" -> filterCompound,
    "q_filter_notnull" -> filterNotnull,
    "q_filter_quantile" -> filterQuantile,
    "q_dedup_latest" -> dedupLatest)

  val oracle: Map[String, String] = Map(
    "q_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q_filter_isin" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         ORDER BY o_orderkey""",
    "q_filter_bool" ->
      """SELECT event_id, value, (value > 100.0) AS is_big FROM events
         WHERE (value > 100.0) = false ORDER BY event_id""",
    "q_filter_between" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE coalesce(l_quantity, 0.0) BETWEEN 10.0 AND 20.0
         ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_returnflag = 'R'
           AND (l_quantity < 3.0 OR l_discount > 0.09 OR l_shipdate IS NULL)
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""",
    "q_filter_notnull" ->
      """SELECT event_id, user_id, value FROM events
         WHERE value IS NOT NULL AND props IS NOT NULL
         ORDER BY event_id""",
    "q_filter_quantile" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         WHERE l_extendedprice >=
           (SELECT quantile_cont(l_extendedprice, 0.99) FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, l_extendedprice""",
    "q_dedup_latest" ->
      """SELECT user_id, event_id, ts FROM (
           SELECT user_id, event_id, ts,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""")
}
