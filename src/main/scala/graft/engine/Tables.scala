package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md §B).
  *
  * Design notes for scale (north star: 100 TB on a multi-executor
  * cluster, tested on local mode):
  *  - every scan goes through `spark.read.parquet` so Catalyst's
  *    vectorized reader, predicate pushdown and column pruning apply —
  *    queries must `select`/`filter` the lazy plan, never materialize
  *    early (the reference eagerly loads whole CSVs into pandas,
  *    `services/analytics/app.py:22-36`);
  *  - dimension tables (`region nation customer supplier part`) are
  *    broadcast at join sites (see graft.ops.Joins) instead of relying
  *    on `autoBroadcastJoinThreshold` alone, mirroring the reference's
  *    preloaded in-memory dim (`services/silver_layer/process_silver.py:233-244`);
  *  - AQE is enabled once per session for runtime coalescing and skew
  *    handling; shuffle partition count is owned by the driver harness.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Naive (isAdjustedToUTC=false) parquet timestamps vary by fixture
    * writer generation: Spark 4 infers them as TIMESTAMP_NTZ, which
    * event-time streaming and `unix_micros` reject. With the session
    * pinned to UTC, casting NTZ->TIMESTAMP preserves the stored wall
    * clock as the same UTC instant DuckDB's oracle reads, so both the
    * LTZ-written and naive-written fixture generations behave
    * identically. */
  private def ltzNormalized(df: DataFrame): DataFrame =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(df)((d, c) => d.withColumn(c,
      d.col(c).cast(org.apache.spark.sql.types.TimestampType)))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    if (name == "events") {
      // events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects. Read nanos as long and truncate to
      // microseconds — bit-identical to DuckDB's parquet ns->us read
      // (verified truncating, not rounding), so oracle values match.
      // DELIBERATELY session-scoped and never restored: the returned
      // frame is lazy, and its scans consult the conf at execution —
      // a save/restore around this read would break them later. The
      // catalog owns its session's tuning (tune() already sets AQE /
      // timezone session-wide); a session reading OTHER nanos parquet
      // as timestamps shouldn't share a catalog-tuned session.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      // the conf only turns TIMESTAMP(NANOS) columns into longs; a
      // micros-written events copy (e.g. engine-produced) reads as a
      // proper timestamp and needs no conversion
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.selectExpr(
            "event_id",
            "timestamp_micros(ts div 1000) AS ts",
            "user_id", "event_type", "value", "props")
        case _ => ltzNormalized(raw)
      }
    } else {
      ltzNormalized(spark.read.parquet(s"$sfDir/$name.parquet"))
    }
  }

  /** One-call SQL surface: temp views for every fixture table (same
    * normalized reads as [[apply]]) plus graft's native SQL functions
    * (`cosine_sim`, `zorder2`), so `spark.sql("SELECT ... FROM
    * lineitem JOIN nation ...")` works immediately — the migration
    * path for users arriving with SQL instead of the DataFrame API.
    * Views are lazy plans over the parquet scans: pushdown, pruning
    * and the whole Catalyst pipeline apply exactly as on the
    * DataFrame face. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    All.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.ZOrder.register(spark)
  }

  /** Idempotent runtime-conf tuning; safe to call per query. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // naive parquet timestamps read as LTZ (UTC), not NTZ — see
    // ltzNormalized; the conf covers reads that bypass this catalog
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark
  }
}
