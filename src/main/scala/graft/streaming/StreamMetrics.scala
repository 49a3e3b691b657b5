package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-trigger observability for the streaming faces — the numbers an
  * operator of a production stream watches (and alerts on): how long
  * each micro-batch took, how many rows it ingested, and how much
  * keyed state the stateful operators are holding/touching. All read
  * from the engine's own `StreamingQueryProgress` (the same source
  * the Structured Streaming UI renders), so every counter exists
  * identically on a real cluster.
  *
  * `stateRows`/`stateUpdated` sum over the query's state operators
  * and read 0 for the foreachBatch-gated faces (incr dedup, ANN
  * refresh), whose durable "state" is the versioned snapshot itself —
  * for those, snapshot row counts are the state metric and batch
  * duration/input rows are what this surfaces.
  */
final case class TriggerMetrics(
    batchId: Long,
    durationMs: Long,
    inputRows: Long,
    stateRows: Long,
    stateUpdated: Long)

object StreamMetrics {

  /** The per-trigger rows a query has accumulated so far (bounded by
    * `spark.sql.streaming.numRecentProgressUpdates`, default 100 —
    * ring-buffered, so a long-lived query costs O(100) driver memory
    * regardless of uptime). Triggers that did no work (no data, no
    * state timeout) are not reported by the engine and so don't
    * appear here. */
  def perTrigger(q: StreamingQuery): Seq[TriggerMetrics] =
    q.recentProgress.toSeq.map { p =>
      val ops = Option(p.stateOperators).map(_.toSeq).getOrElse(Seq.empty)
      TriggerMetrics(
        batchId = p.batchId,
        durationMs = p.batchDuration,
        inputRows = p.numInputRows,
        stateRows = ops.map(_.numRowsTotal).sum,
        stateUpdated = ops.map(_.numRowsUpdated).sum)
    }

  /** Render one line per trigger — the soak logs' format. */
  def pretty(rows: Seq[TriggerMetrics]): String =
    rows.map(r => s"batch=${r.batchId} ${r.durationMs}ms " +
      s"in=${r.inputRows} state=${r.stateRows}(+${r.stateUpdated})")
      .mkString("\n")
}
