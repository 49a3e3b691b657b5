package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ScalarFnsSpec extends SparkTestBase {
  import spark.implicits._

  test("clamp stays within [10, 100] for all inputs") {
    val vals = Seq(-5.0, 0.0, 10.0, 55.5, 100.0, 1e6).toDF("value")
    val got = vals
      .select(least(greatest($"value", lit(10.0)), lit(100.0)).as("c"))
      .as[Double].collect()
    assert(got.forall(v => v >= 10.0 && v <= 100.0))
    assert(got.toSeq == Seq(10.0, 10.0, 10.0, 55.5, 100.0, 100.0))
  }

  test("bucketize boundaries are left-closed") {
    val df = Seq(999.99, 1000.0, 49999.99, 50000.0, 100000.0).toDF("p")
    val got = df.select(
      when($"p" < 1000.0, "0-1k")
        .when($"p" < 10000.0, "1k-10k")
        .when($"p" < 50000.0, "10k-50k")
        .when($"p" < 100000.0, "50k-100k")
        .otherwise("100k+").as("b")).as[String].collect().toSeq
    assert(got == Seq("0-1k", "1k-10k", "10k-50k", "50k-100k", "100k+"))
  }

  test("geo dead-reckoning matches a Scala great-circle recompute; zero speed is identity") {
    // the old [-90, 90] bound was tautological (degrees(asin(x)) is in
    // that range by construction) and the zero-speed check evaluated
    // an inline SQL COPY of the formula, never the op. Here: run THE
    // OP on a crafted lineitem and compare against an independent
    // Scala implementation of the great-circle step.
    // Derivations in the op: lat = 2*qty - 50, lon = ep % 360 - 180,
    // track = suppkey % 360, speed = tax * 2000.
    val dir = java.nio.file.Files.createTempDirectory("graft_geo").toString
    Seq(
      // (orderkey, linenumber, qty, extendedprice, suppkey, tax)
      (1L, 1, 49.0, 182.0, 90L, 0.005), // lat 48, lon 2, east, 10 m/s
      (2L, 1, 10.0, 300.0, 45L, 0.1),   // lat -30, lon 120, NE, 200 m/s
      (3L, 1, 49.0, 182.0, 90L, 0.0))   // zero speed -> identity
      .toDF("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_suppkey", "l_tax")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    def predict(lat: Double, lon: Double, track: Double, speed: Double)
        : (Double, Double) = {
      val d = speed * 300.0 / 6371000.0
      val latR = math.toRadians(lat)
      val trR = math.toRadians(track)
      val lat2 = math.asin(
        math.sin(latR) * math.cos(d) +
          math.cos(latR) * math.sin(d) * math.cos(trR))
      val lon2 = math.toRadians(lon) + math.atan2(
        math.sin(trR) * math.sin(d) * math.cos(latR),
        math.cos(d) - math.sin(latR) * math.sin(lat2))
      // HALF_UP on valueOf, matching Spark's Round for doubles (rint
      // is half-even and could diverge on exact .00005 boundaries)
      def r4(x: Double) = java.math.BigDecimal.valueOf(math.toDegrees(x))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
      (r4(lat2), r4(lon2))
    }
    val got = ScalarFns.fnGeoPredict(spark, dir)
      .select($"l_orderkey", $"pred_lat", $"pred_lon")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) == predict(48.0, 2.0, 90.0, 10.0))
    assert(got(2L) == predict(-30.0, 120.0, 45.0, 200.0))
    assert(got(3L) == ((48.0, 2.0)), s"zero speed must be identity: ${got(3L)}")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("json extraction returns null for missing keys") {
    val df = Seq("""{"k": 7}""", """{"other": 1}""", "not-json").toDF("props")
    val got = df
      .select(get_json_object($"props", "$.k").cast("int").as("k"))
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(7), None, None))
  }

  test("ts parse round-trip truncates to seconds") {
    val got = ScalarFns.fnTsParse(spark, sfSmoke)
      .select(date_format($"parsed", "SSS").cast("int"))
      .as[Int].collect()
    assert(got.nonEmpty) // forall is vacuous on an empty result
    assert(got.forall(_ == 0))
  }
}
