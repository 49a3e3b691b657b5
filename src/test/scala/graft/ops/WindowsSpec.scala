package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase

/** Pins for the distributed re-expressions of the global/giant-group
  * window analytics: the scale-safe forms must be BITWISE the
  * single-partition built-ins they replace — that equality is what
  * licenses swapping them into oracle-checked queries untouched. */
class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed ntile matches the built-in global window bitwise") {
    val got = Windows.windowNtile(spark, sfSmoke)
      .as[(Long, Double, Int)].collect().toSeq
    val w = Window.orderBy($"o_totalprice", $"o_orderkey")
    val builtin = graft.engine.Tables(spark, sfSmoke, "orders")
      .withColumn("quartile", ntile(4).over(w))
      .select($"o_orderkey", $"o_totalprice", $"quartile")
      .orderBy($"o_orderkey")
      .as[(Long, Double, Int)].collect().toSeq
    assert(got == builtin)
  }

  test("ntile bucket arithmetic handles n % k != 0 (uneven buckets)") {
    // n=11, k=4 -> bucket sizes 3,3,3,2: the first n%k buckets carry
    // the extra row, exactly Spark's NTile
    val dir = java.nio.file.Files.createTempDirectory("graft_ntile").toString
    (1 to 11).map(i => (i.toLong, i * 10.0))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Windows.windowNtile(spark, dir)
      .select($"o_orderkey", $"quartile").as[(Long, Int)].collect().toSeq
    val expected = Seq(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 2, 5 -> 2, 6 -> 2,
      7 -> 3, 8 -> 3, 9 -> 3, 10 -> 4, 11 -> 4)
      .map { case (k, q) => (k.toLong, q) }
    assert(got == expected)
  }

  test("distributed percent_rank/cume_dist match the windowed built-ins bitwise") {
    val got = Windows.windowCume(spark, sfSmoke)
      .as[(String, Double, Double, Double)].collect().toSeq
    val w = Window.partitionBy($"event_type").orderBy($"value")
    val builtin = graft.engine.Tables(spark, sfSmoke, "events")
      .select($"event_type", $"value",
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy($"event_type", $"value", $"pr", $"cd")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(got == builtin)
  }

  test("distribution functions: single-row group and tie rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cume").toString
    // 'solo' exercises the n==1 -> percent_rank 0.0 guard; 'dup' the
    // tie rows sharing rank and cume_dist
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(("solo", 5.0, 1L, t0), ("dup", 1.0, 2L, t0), ("dup", 1.0, 3L, t0),
      ("dup", 2.0, 4L, t0))
      .toDF("event_type", "value", "event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Windows.windowCume(spark, dir)
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("dup", 1.0, 0.0, 0.666667), ("dup", 1.0, 0.0, 0.666667),
      ("dup", 2.0, 1.0, 1.0), ("solo", 5.0, 0.0, 1.0)))
  }
}
