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

  /** Map-merge with a duplicate-key guard: `++` silently keeps the
    * LAST module's entry, so a name collision between modules would
    * shadow an operator (and its oracle) without any signal — the
    * driver would just quietly check one query fewer. */
  private def merged[A](ms: Seq[Map[String, A]], what: String)
      : Map[String, A] = {
    val out = ms.reduce(_ ++ _)
    val n = ms.map(_.size).sum
    require(out.size == n, {
      val dups = ms.flatMap(_.keys).groupBy(identity)
        .collect { case (k, vs) if vs.size > 1 => k }
      s"duplicate $what across modules: ${dups.mkString(", ")}"
    })
    out
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(modules.map(_._1), "query names")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged(modules.map(_._2), "oracle entries")
}
