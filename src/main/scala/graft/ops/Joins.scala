package graft.ops

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Joins (SURVEY.md §2.3).
  *
  * Reference behaviors:
  *  - fact x dim left enrichment join with 'Unknown' fill
  *    (`services/silver_layer/process_silver.py:107-112,247-248`);
  *  - per-row metadata lookup — same left-join semantics
  *    (`services/consumer/consumer.py:88-98`);
  *  - implied inner join in dashboard filters (`services/analytics/app.py:205-216`);
  *  - matched/unmatched metadata split == semi/anti join
  *    (`services/consumer/consumer.py:91-92`).
  *
  * Scale notes: dimensions are `broadcast()`-hinted — BroadcastHashJoin,
  * no shuffle of the fact side (the reference preloads its ~100 MB dim in
  * memory for the same reason). The inner join chain aggregates with
  * map-side partial aggregation after a single AQE-planned join tree.
  */
object Joins {

  /** J1/J2: broadcast left equi-join enrichment + Unknown fill. */
  val joinLeftEnrich: Q = (spark, dir) => {
    val orders = Tables(spark, dir, "orders")
    val dim = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    orders
      .join(broadcast(dim), orders("o_custkey") === dim("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        coalesce(col("c_name"), lit("Unknown")).as("c_name"),
        coalesce(col("c_mktsegment"), lit("Unknown")).as("c_mktsegment"))
      .orderBy(col("o_orderkey"))
  }

  /** J3: inner equi-join chain + aggregate. */
  val joinInner: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** LEFT SEMI: customers that have at least one order. */
  val joinSemi: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders").select(col("o_custkey"))
    cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** LEFT ANTI: customers with no orders (unmatched-metadata split). */
  val joinAnti: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders").select(col("o_custkey"))
    cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q_join_left_enrich" -> joinLeftEnrich,
    "q_join_inner" -> joinInner,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti)

  val oracle: Map[String, String] = Map(
    "q_join_left_enrich" ->
      """SELECT o_orderkey, o_custkey,
                coalesce(c_name, 'Unknown') AS c_name,
                coalesce(c_mktsegment, 'Unknown') AS c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_join_inner" ->
      """SELECT c_mktsegment, count(*) AS cnt,
                round(sum(l_extendedprice), 4) AS sum_price
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
         ORDER BY c_custkey""")
}
