package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.engine.{Tables, VersionedTable}

/** Golden-file regression for the three §3 lifecycle pipelines
  * (SURVEY §5.2 item 3, shipped as written): the bronze ingest with
  * its quarantine lane (§3.1), the silver broadcast enrichment
  * (§3.2), and the serving commit + flagship analytics read (§3.3)
  * run end-to-end on inputs derived DETERMINISTICALLY from the
  * sf0.001 fixtures, and every stage's output is string-diffed
  * against a committed golden under src/test/resources/goldens/.
  *
  * The demo (graft.tools.MedallionDemo) exercises the same stages
  * with planted rows and asserts properties; this spec pins exact
  * bytes, so ANY behavioral drift in parse/normalize/quarantine/
  * enrich/commit — a changed null rule, a reordered coalesce, a
  * different rounding — diffs loudly instead of sliding through a
  * property check.
  *
  * Regenerating (after an INTENTIONAL semantics change): run with
  * GRAFT_REGEN_GOLDENS=1 and commit the rewritten files; the diff in
  * review IS the record of the semantic change. */
class LifecycleGoldenSpec extends SparkTestBase {
  import spark.implicits._

  /** Canonical rendering: one line per row, columns joined by '|',
    * rows sorted lexicographically (layout/parallelism neutral),
    * doubles fixed to 4 places via Locale.ROOT (the Bench JSON rule:
    * the f-interpolator is locale-sensitive and would render comma
    * decimals on a de/fr-locale JVM — corrupting the diff, or worse,
    * a regenerated golden). */
  private def canon(df: DataFrame): String =
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case d: Double => String.format(java.util.Locale.ROOT, "%.4f", d)
      case f: Float => String.format(java.util.Locale.ROOT, "%.4f", f)
      case x => x.toString
    }.mkString("|")).sorted.mkString("\n") + "\n"

  private val regen = sys.env.contains("GRAFT_REGEN_GOLDENS")

  private def checkGolden(name: String, actual: String): Unit = {
    if (regen) {
      val p = Paths.get("src/test/resources/goldens", name)
      Files.createDirectories(p.getParent)
      Files.write(p, actual.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val in = getClass.getResourceAsStream(s"/goldens/$name")
    assert(in != null || regen,
      s"golden /goldens/$name missing — run once with GRAFT_REGEN_GOLDENS=1")
    if (in != null) {
      val expected =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      assert(actual == expected,
        s"golden $name diverged — if the change is intentional, " +
          s"regenerate with GRAFT_REGEN_GOLDENS=1 and commit the diff.\n" +
          s"--- expected (first 400) ---\n${expected.take(400)}\n" +
          s"--- actual (first 400) ---\n${actual.take(400)}")
    }
  }

  test("lifecycle goldens: bronze ingest+quarantine, silver enrich, serving analytics pinned at sf0.001") {
    val root = Files.createTempDirectory("graft_lifecycle").toString

    // -- deterministic §3.1 input from the sf0.001 customer/nation
    // fixtures: 12 positional state-vector lines (plus one case-variant
    // duplicate exercising icao24 normalization and two planted
    // malformed lines exercising the quarantine lane)
    val cust = Tables(spark, sfSmoke, "customer")
      .join(Tables(spark, sfSmoke, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("c_custkey") <= 12)
      .select(col("c_custkey").as("k"), col("c_name").as("nm"),
        col("n_name").as("country"))
      .orderBy(col("k"))
      .as[(Long, String, String)].collect()
    def line(k: Long, nm: String, country: String,
        icaoCase: String => String): String = {
      val icao = icaoCase(f"ab${k}%04x")
      val lc = 1700000000L + k * 60
      val lon = -180.0 + (k * 7 % 360)
      val lat = -90.0 + (k * 3 % 180)
      val vel = 200.0 + k
      s"""["$icao", "$nm  ", "$country", ${lc - 10}, $lc, $lon, $lat,""" +
        s""" 10000.0, false, $vel, 90.0, 1.0, null, 10100.0, "7000",""" +
        " false, 0, 3]"
    }
    val good = cust.map { case (k, nm, c) => line(k, nm, c, identity) }
    val dupAndBad = Seq(
      line(1L, cust.head._2, cust.head._3, _.toUpperCase), // case dup
      """["BAD1", "TRUNCATED""", // not parseable as a JSON array
      """["ab0002", "SHORT", "X", 1, 2, 3.0]""") // short array
    val srcDir = s"$root/bronze_src"
    Files.createDirectories(Paths.get(srcDir))
    Files.write(Paths.get(srcDir, "batch1.jsonl"),
      (good.toSeq ++ dupAndBad).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // -- §3.1 bronze ingest with the quarantine lane
    Pipelines.runIngestQuarantine(
      Pipelines.bronzeSource(spark, srcDir),
      s"$root/bronze", s"$root/quarantine",
      s"$root/ckpt_ingest").awaitTermination()
    val bronze = spark.read.parquet(s"$root/bronze")
    checkGolden("bronze.txt", canon(bronze))
    checkGolden("quarantine.txt",
      canon(spark.read.parquet(s"$root/quarantine")))

    // -- §3.2 silver: streaming broadcast enrichment of clean bronze
    // against a dim derived from the same fixture slice (keys 1..6
    // only, so the Unknown fill-path is exercised by 7..12)
    val dim = cust.take(6).map { case (k, _, c) =>
      (f"ab${k}%04x", s"M-${k}", s"OP-${c.take(3)}") }
      .toSeq.toDF("icao24", "model", "operator")
    val silverQ = Pipelines.enrich(
        spark.readStream.schema(bronze.schema).parquet(s"$root/bronze"), dim)
      .writeStream.format("parquet")
      .option("path", s"$root/silver")
      .option("checkpointLocation", s"$root/ckpt_silver")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    silverQ.awaitTermination()
    val silver = spark.read.parquet(s"$root/silver")
    checkGolden("silver.txt", canon(silver))

    // -- §3.3 serving: versioned commit + keyed upsert (the demo's
    // velocity bump), then the flagship country-intelligence read
    val servingDir = s"$root/serving"
    VersionedTable.commit(silver, servingDir)
    VersionedTable.commit(
      VersionedTable.upsert(
        VersionedTable.read(spark, servingDir),
        silver.withColumn("velocity_ms", col("velocity_ms") + 1.0),
        "icao24"),
      servingDir)
    val analytics = VersionedTable.read(spark, servingDir)
      .filter(col("on_ground") === false)
      .groupBy(col("origin_country"))
      .agg(
        count(lit(1)).as("flights"),
        round(avg(col("velocity_ms")), 1).as("avg_speed"),
        countDistinct(col("operator")).as("n_operators"))
    checkGolden("serving_analytics.txt", canon(analytics))

    graft.util.Fs.deleteRecursively(root)
  }
}
