package graft.ops

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Sorts / limits / top-k and set operations (SURVEY.md §2.6, §2.7).
  *
  * Reference behaviors:
  *  - sort desc + head ("fastest flights", `services/analytics/app.py:296-310`);
  *  - plain limit (`services/analytics/app.py:330-334`);
  *  - sorted scan (`services/dashboard/dashboard.py:30`);
  *  - union-all across files (`services/dashboard/dashboard.py:45-65`,
  *    implemented in Scans.unionAll);
  *  - EXCEPT on keys is the natural extension of the unmatched-metadata
  *    split (SURVEY §2.7).
  *
  * Scale notes: orderBy+limit compiles to TakeOrderedAndProject (bounded
  * per-partition heaps + driver merge of k rows — no global sort at any
  * size). A bare `limit(n)` is nondeterministic under parallelism, so the
  * deterministic engine form is ordered-limit. EXCEPT plans as a hash
  * left-anti join on the key after local distinct.
  */
object Sorts {

  /** T1: top-k by sort desc + limit (with total tie-break). */
  val topkSortLimit: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  /** T2: plain limit, made deterministic by an ordering key. */
  val limitN: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(20)

  /** T3: full ascending sort. */
  val sortAsc: Q = (spark, dir) =>
    Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_name"))

  /** T4: seeded Bernoulli sampling (dashboard.py:122,152 samples for
    * viz). Deterministic given (seed, partitioning) but the draw
    * differs from any SQL engine's sampler, so the check is rows-only
    * by design — the count assertion (fraction±tolerance) lives in the
    * spec. Sampling is a narrow transformation: no shuffle, each
    * partition thins locally, so it scales with the scan. */
  val sample: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** EXCEPT: customer keys with no orders. */
  val exceptKeys: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer").select(col("c_custkey"))
    val ordered = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("c_custkey"))
    cust.except(ordered).orderBy(col("c_custkey"))
  }

  /** INTERSECT: customers active in BOTH 1996 and 1997 (set semantics,
    * distinct — same plan shape as a semi-join + distinct). */
  val intersectKeys: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
    val a = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
    val b = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    a.intersect(b).orderBy(col("o_custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q_topk_sort_limit" -> topkSortLimit,
    "q_limit" -> limitN,
    "q_sort_asc" -> sortAsc,
    "q_sample" -> sample,
    "q_except" -> exceptKeys,
    "q_intersect" -> intersectKeys)

  val oracle: Map[String, String] = Map(
    "q_topk_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
    "q_limit" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 20""",
    "q_sort_asc" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name",
    "q_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT SELECT o_custkey AS c_custkey FROM orders
         ORDER BY c_custkey""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         ORDER BY o_custkey""")
}
