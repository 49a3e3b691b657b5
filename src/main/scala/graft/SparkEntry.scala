package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every operator from SURVEY §2 is one named entry in `queries`; where
  * the semantics are ANSI-SQL-expressible the matching DuckDB oracle is
  * in `oracleSql` (column names aliased identically on both sides,
  * total ORDER BY, doubles rounded — SURVEY §5.2 determinism rules).
  */
object SparkEntry {

  /** Flagship query ("country intelligence", SURVEY §7.1) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.aggGroupbyMulti(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Scans.queries, Scans.oracle),
    (Filters.queries, Filters.oracle),
    (Joins.queries, Joins.oracle),
    (Aggs.queries, Aggs.oracle),
    (Windows.queries, Windows.oracle),
    (Sorts.queries, Sorts.oracle),
    (ScalarFns.queries, ScalarFns.oracle),
    (StreamingOps.queries, StreamingOps.oracle),
    (Ml.queries, Ml.oracle),
    (Llm.queries, Llm.oracle),
    (Advanced.queries, Advanced.oracle),
    (Quality.queries, Quality.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
