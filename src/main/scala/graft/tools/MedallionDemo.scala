package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.VersionedTable
import graft.streaming.Pipelines

/** Executable end-to-end medallion run — the reference's whole
  * pipeline shape (`README.md:31-41` producer -> Kafka -> consumer ->
  * bronze -> silver -> dashboards) on this engine, in one JVM:
  *
  *   bronze JSONL (positional state vectors, duplicates, schema edge
  *   cases) -> streaming ingest (parse/normalize/dedup, checkpointed)
  *   -> streaming silver (broadcast dim enrichment) -> VersionedTable
  *   serving commit -> analytics aggregation over the serving snapshot.
  *
  * Usage: runMain graft.tools.MedallionDemo
  */
object MedallionDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-medallion-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft_medallion").toString
    val bronzeSrc = s"$root/bronze_src"
    Files.createDirectories(Paths.get(bronzeSrc))

    // -- bronze via the REST polling face (S1): two polls drop atomic
    // JSONL batch files; the second poll carries planted corrupt
    // lines that must land in quarantine, never in bronze
    def state(icao: String, call: String, country: String, lc: Long,
        lon: Double, lat: Double, vel: Double): String =
      s"""["$icao", "$call", "$country", ${lc - 10}, $lc, $lon, $lat,""" +
        s""" 10000.0, false, $vel, 90.0, 1.0, null, 10100.0, "7000",""" +
        " false, 0, 3]"
    val polls = Iterator(
      Seq(
        state("AB1", "AFR101  ", "France", 1700000100, 2.1, 48.8, 250.0),
        state("ab1", "AFR101  ", "France", 1700000150, 2.2, 48.9, 251.0),
        state("CD2", "DLH202  ", "Germany", 1700000100, 13.4, 52.5, 230.0)),
      Seq(
        state("EF3", "UAL303  ", "United States", 1700000100, -73.9, 40.7, 260.0),
        """["BAD4", "TRUNCATED""", // not parseable as a JSON array
        """["GH5", "C5", "Spain", 1700000100, 1700000110, "EAST", 41.0,""" +
          """ 100.0, false, 10.0, 5.0, 0.1, null, 110.0, "1000", false, 0]"""))
    val dropped = graft.streaming.RestPoller.pollLoop(
      () => polls.next(), bronzeSrc, intervalMs = 0, maxBatches = 2)
    println(s"== bronze source: $bronzeSrc (${dropped.size} polled batches)")

    // -- ingest with the quarantine lane: good rows -> bronze parquet,
    // malformed lines -> (raw, reason) quarantine parquet
    Pipelines.runIngestQuarantine(
      Pipelines.bronzeSource(spark, bronzeSrc),
      s"$root/bronze", s"$root/quarantine",
      s"$root/ckpt_ingest").awaitTermination()
    val bronze = spark.read.parquet(s"$root/bronze")
    val quarantined = spark.read.parquet(s"$root/quarantine")
    println(s"== ingest: ${bronze.count()} clean rows; " +
      s"quarantined ${quarantined.count()}:")
    quarantined.select(col("reason"), col("raw")).show(truncate = false)
    require(quarantined.count() >= 2,
      "the planted bad lines must land in the quarantine lane")
    require(bronze.filter(col("longitude").isNull).count() == 0,
      "no silently-nulled numerics may reach bronze")

    // -- silver: broadcast enrichment of the CLEAN bronze table (the
    // true medallion shape — silver consumes the quarantine-filtered
    // bronze layer, not the raw feed)
    val dim = Seq(
      ("AB1", "A320", "Air France"),
      ("CD2", "A350", "Lufthansa"))
      .toDF("icao24", "model", "operator")
    val silverQ = Pipelines.enrich(
        spark.readStream.schema(bronze.schema).parquet(s"$root/bronze"), dim)
      .writeStream.format("parquet")
      .option("path", s"$root/silver")
      .option("checkpointLocation", s"$root/ckpt_silver")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    silverQ.awaitTermination()
    val silver = spark.read.parquet(s"$root/silver")
    println(s"== silver: ${silver.count()} rows enriched")

    // -- serving: versioned snapshot commits (copy-on-write + pointer)
    val servingDir = s"$root/serving"
    VersionedTable.commit(silver, servingDir)
    val updated = silver.withColumn("velocity_ms", col("velocity_ms") + 1.0)
    VersionedTable.commit(
      VersionedTable.upsert(
        VersionedTable.read(spark, servingDir), updated, "icao24"),
      servingDir)
    println(s"== serving versions: ${VersionedTable.versions(spark, servingDir)}")

    // -- OPTIMIZE: Z-order the serving layer on (longitude, latitude)
    // buckets and commit with a per-file min/max manifest, then answer
    // a 2-D range query through the pruned read path — the maintenance
    // step a real lake runs nightly (compaction + layout + stats)
    graft.functions.ZOrder.register(spark)
    val clustered = VersionedTable.read(spark, servingDir)
      .withColumn("lon_b", ((col("longitude") + 180.0) * 10).cast("long"))
      .withColumn("lat_b", ((col("latitude") + 90.0) * 10).cast("long"))
      .withColumn("zv", expr("zorder2(lon_b, lat_b)"))
      .repartitionByRange(2, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
    // the layout step ADDS bucket columns — an additive schema change,
    // so the commit opts in to evolution (enforcement rejects it otherwise)
    VersionedTable.commitWithStats(clustered, servingDir,
      Seq("lon_b", "lat_b"), allowEvolution = true)
    val (europe, filesRead, filesTotal) = VersionedTable.readPruned(
      spark, servingDir,
      Map("lon_b" -> ((1800L, 1999L)), "lat_b" -> ((1300L, 1499L))))
    println(s"== optimize: z-ordered serving committed; Europe-box query " +
      s"read $filesRead/$filesTotal files, ${europe.count()} rows")

    // -- analytics: the flagship country-intelligence shape (§7.1)
    val result = VersionedTable.read(spark, servingDir)
      .filter(col("on_ground") === false)
      .groupBy(col("origin_country"))
      .agg(
        count(lit(1)).as("flights"),
        round(avg(col("velocity_ms")), 1).as("avg_speed"),
        countDistinct(col("operator")).as("n_operators"))
      .orderBy(col("flights").desc, col("origin_country"))
    result.show(truncate = false)

    spark.stop()
  }
}
