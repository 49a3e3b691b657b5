package graft.ops

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.streaming.Pipelines

/** Batch-checkable faces of the streaming semantics (SURVEY.md §2.9).
  *
  * DuckDB cannot run a stream, so the oracle checks the batch
  * equivalence: a tumbling event-time window aggregation produces the
  * same result as `date_trunc`-keyed grouping on the at-rest table
  * (X5 — the reference computes hourly "windows" post-hoc the same way,
  * `services/dashboard/dashboard.py:90,229-233`). The streaming form of
  * the exact same plan (`Pipelines.tumblingCounts` over a file stream)
  * is exercised in StreamingSpec.
  */
object StreamingOps {

  /** X5: tumbling 1h window counts — batch form, same code path as the
    * streaming query. */
  val streamTumbling: Q = (spark, dir) =>
    Pipelines.tumblingCounts(Tables(spark, dir, "events"))
      .orderBy(col("window_start"), col("event_type"))

  /** X5 sliding: 1-hour windows every 30 minutes — each event lands in
    * two windows. The oracle reconstructs the same assignment from
    * integer epoch arithmetic (union of the two aligned starts). */
  val streamSliding: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("cnt"))
      .orderBy(col("window_start"), col("event_type"))

  /** Stream-stream interval join, batch face — same code path the
    * streaming query runs (Pipelines.clickAttribution); the oracle is
    * the plain interval join. */
  val streamJoin: Q = (spark, dir) =>
    Pipelines.clickAttribution(Tables(spark, dir, "events"))
      .orderBy(col("purchase_id"), col("click_id"))

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_sliding" -> streamSliding,
    "q_stream_join" -> streamJoin)

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
                count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events GROUP BY date_trunc('hour', ts), event_type
         ORDER BY window_start, event_type""",
    "q_stream_sliding" ->
      """WITH assigned AS (
           SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
                    AS window_start, event_type
           FROM events
           UNION ALL
           SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
                                 - 1800000000) AS window_start, event_type
           FROM events)
         SELECT window_start, event_type, count(*) AS cnt
         FROM assigned GROUP BY window_start, event_type
         ORDER BY window_start, event_type""",
    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
                p.ts AS purchase_ts,
                c.event_id AS click_id, c.ts AS click_ts
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL 10 MINUTE
         ORDER BY purchase_id, click_id""")
}
