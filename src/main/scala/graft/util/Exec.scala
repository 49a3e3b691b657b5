package graft.util

import org.apache.spark.sql.DataFrame

object Exec {

  /** Execute a DataFrame COMPLETELY, producing every output row into
    * the no-op sink, without collecting anything to the driver.
    *
    * This, not `.count()`, is the benchmark action: under `count()`
    * Catalyst legitimately optimizes away work that cannot change the
    * row count — an UNGROUPED aggregate keeps its single output row
    * but loses its aggregate expressions (a `percentile` entry timed
    * 0.16 s because the plan it ran was empty), and `EliminateSorts`
    * removes a final ORDER BY entirely. Timing harnesses that compare
    * against an external engine fetching real values must pay the
    * same work the values cost. */
  def drain(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
