package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.SparkTestBase

class BloomMightContainSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchOf(values: Seq[Long], n: Long = 1000, fpp: Double = 0.01)
      : BloomFilter = {
    val f = BloomFilter.create(n, fpp)
    values.foreach(f.putLong)
    f
  }

  test("no false negatives: every inserted digest tests true") {
    val inserted = (0L until 500L).map(_ * 7919L)
    val sketch = sketchOf(inserted)
    val hits = inserted.toDF("h")
      .filter(BloomMightContain(spark, col("h"), sketch))
      .count()
    assert(hits == inserted.size, "a bloom filter must never drop a member")
  }

  test("false-positive rate stays near the configured fpp") {
    val inserted = (0L until 1000L)
    val sketch = sketchOf(inserted, n = 1000, fpp = 0.01)
    // disjoint probe range
    val probes = (1000000L until 1010000L).toDF("h")
    val fp = probes.filter(BloomMightContain(spark, col("h"), sketch)).count()
    assert(fp < 10000 * 0.05, s"fp rate ${fp / 10000.0} far above configured 0.01")
  }

  test("agrees with df.stat.bloomFilter's insert hashing") {
    // the production path builds the sketch distributed via
    // stat.bloomFilter; the probe side must see those longs
    val vals = (0L until 200L).map(_ * 104729L)
    val sketch = vals.toDF("h").stat.bloomFilter("h", 200L, 0.01)
    val hits = vals.toDF("h")
      .filter(BloomMightContain(spark, col("h"), sketch)).count()
    assert(hits == vals.size,
      "stat.bloomFilter inserts and expression probes must share hashing")
  }

  test("codegen and interpreted paths agree row-for-row") {
    val sketch = sketchOf((0L until 100L).map(_ * 31L))
    val df = (0L until 3100L).toDF("h")
    val pred = BloomMightContain(spark, col("h"), sketch)
    val viaCodegen = df.filter(pred).as[Long].collect().toSet
    val oldFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val oldWhole = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaInterp = df.filter(pred).as[Long].collect().toSet
      assert(viaCodegen == viaInterp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", oldWhole)
      spark.conf.set("spark.sql.codegen.factoryMode", oldFactory)
    }
  }

  test("unregisterAll drops every accreted sketch registration") {
    BloomMightContain.unregisterAll(spark)
    val s1 = sketchOf(Seq(1L))
    val s2 = sketchOf(Seq(2L, 3L))
    Seq(1L).toDF("h").filter(BloomMightContain(spark, col("h"), s1)).count()
    Seq(2L).toDF("h").filter(BloomMightContain(spark, col("h"), s2)).count()
    assert(BloomMightContain.unregisterAll(spark) == 2,
      "both content-keyed registrations must be dropped")
    assert(BloomMightContain.unregisterAll(spark) == 0, "idempotent")
  }

  test("null digest yields null (filter drops it), non-long input fails analysis") {
    val sketch = sketchOf(Seq(1L, 2L))
    val withNull = Seq(Some(1L), None).toDF("h")
    assert(withNull.filter(BloomMightContain(spark, col("h"), sketch))
      .count() == 1)
    val bad = Seq("x").toDF("h")
    intercept[Exception](
      bad.filter(BloomMightContain(spark, col("h"), sketch)).collect())
  }
}
