package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Data-quality constraint checks — the Deequ / Delta-constraints role
  * a lake engine needs before anything downstream trusts a table:
  * referential integrity, key uniqueness, null rates, and domain
  * checks, emitted as ONE small report (check, n_violations).
  *
  * Scale shape: every check is a single aggregate or broadcast anti
  * join over its own pushed/pruned scan — no check ever joins two
  * facts — and the report is a union of one-row frames (metadata-
  * sized). Checks run independently, so on a cluster they parallelize
  * across the scheduler; a 100 TB table pays one scan per distinct
  * source table (Spark shares nothing across checks by design — this
  * is the nightly audit job, not a hot path).
  *
  * The fixture star schema makes several checks non-trivially
  * non-zero (lineitem's (l_orderkey, l_linenumber) famously collides
  * — the verify gotcha list exists because of it), so the report is a
  * real signal, not a wall of zeros.
  */
object Quality {

  /** One row per constraint: (check, n_violations), ordered. */
  val dqReport: Q = (spark, dir) => {
    def one(name: String, cnt: DataFrame): DataFrame =
      cnt.select(lit(name).as("check"), col("n").cast("long").as("n_violations"))

    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    val customer = Tables(spark, dir, "customer")
    val events = Tables(spark, dir, "events")

    val orphanOrders = one("orders_orphan_custkey",
      orders.join(broadcast(customer.select(col("c_custkey"))),
          orders("o_custkey") === customer("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")))
    val dupLineKeys = one("lineitem_dup_linekey",
      lineitem.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(count(lit(1)).as("n")))
    val nonPosQty = one("lineitem_nonpositive_qty",
      lineitem.agg(sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("n")))
    val nullSegment = one("customer_null_mktsegment",
      customer.agg(sum(when(col("c_mktsegment").isNull, 1L).otherwise(0L)).as("n")))
    val nullUser = one("events_null_user",
      events.agg(sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n")))
    val badStatus = one("orders_bad_status",
      orders.agg(sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("n")))

    orphanOrders
      .unionByName(dupLineKeys)
      .unionByName(nonPosQty)
      .unionByName(nullSegment)
      .unionByName(nullUser)
      .unionByName(badStatus)
      .orderBy(col("check"))
  }

  val queries: Map[String, Q] = Map(
    "q_dq_report" -> dqReport)

  val oracle: Map[String, String] = Map(
    "q_dq_report" ->
      """SELECT * FROM (
           SELECT 'orders_orphan_custkey' AS check,
                  CAST(count(*) AS BIGINT) AS n_violations
           FROM orders o WHERE NOT EXISTS (
             SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
           UNION ALL
           SELECT 'lineitem_dup_linekey',
                  CAST(count(*) AS BIGINT) FROM (
             SELECT 1 FROM lineitem
             GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
           UNION ALL
           SELECT 'lineitem_nonpositive_qty',
                  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
                       AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'customer_null_mktsegment',
                  CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) FROM customer
           UNION ALL
           SELECT 'events_null_user',
                  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) FROM events
           UNION ALL
           SELECT 'orders_bad_status',
                  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                           THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
         ORDER BY "check"""")
}
