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

  test("geo dead-reckoning yields latitudes in [-90, 90]") {
    val got = ScalarFns.fnGeoPredict(spark, sfSmoke)
      .select($"pred_lat").as[Double].collect()
    assert(got.nonEmpty)
    assert(got.forall(v => v >= -90.0 && v <= 90.0))
  }

  test("zero speed predicts the current position") {
    val df = Seq((48.0, 2.0, 90.0, 0.0)).toDF("lat", "lon", "track", "speed_ms")
    val got = df.selectExpr(
      "round(degrees(asin(sin(radians(lat)) * cos(speed_ms * 300.0 / 6371000.0)" +
        " + cos(radians(lat)) * sin(speed_ms * 300.0 / 6371000.0)" +
        " * cos(radians(track)))), 4) AS pred_lat")
      .as[Double].head()
    assert(got == 48.0)
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
    assert(got.forall(_ == 0))
  }
}
