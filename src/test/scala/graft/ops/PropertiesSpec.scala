package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase

/** Property-based invariants (SURVEY.md §5.2): dedup idempotence,
  * union additivity, clamp bounds, percentile monotonicity, salted-agg
  * equivalence — each over generated inputs through the real Spark
  * operators. */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))

  test("dedup-by-latest is idempotent and keeps one row per key") {
    check("dedup", Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "id")
        val w = Window.partitionBy($"k").orderBy($"t".desc, $"id".desc)
        def dedup(d: org.apache.spark.sql.DataFrame) =
          d.withColumn("rn", row_number().over(w))
            .filter($"rn" === 1).drop("rn")
        val once = dedup(df).collect().toSet
        val twice = dedup(dedup(df)).collect().toSet
        once == twice && once.size == rows.map(_._1).distinct.size
      }
    })
  }

  test("union-all count is additive") {
    check("union", Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      val da = a.toDF("k", "t")
      val db = b.toDF("k", "t")
      da.unionByName(db).count() == a.size.toLong + b.size.toLong
    })
  }

  test("clamp output always within bounds and is idempotent") {
    val doubles = Gen.listOfN(30, Gen.choose(-1e6, 1e6))
    check("clamp", Prop.forAll(doubles) { xs =>
      xs.isEmpty || {
        def clamp(c: org.apache.spark.sql.Column) =
          least(greatest(c, lit(10.0)), lit(100.0))
        val out = xs.toDF("x").select(clamp($"x").as("c"))
        val vals = out.as[Double].collect()
        val again = out.select(clamp($"c")).as[Double].collect()
        vals.forall(v => v >= 10.0 && v <= 100.0) &&
          vals.toSeq == again.toSeq
      }
    })
  }

  test("percentile is monotone in p and bounded by min/max") {
    val doubles = Gen.listOfN(25, Gen.choose(-1e4, 1e4))
    check("percentile", Prop.forAll(doubles) { xs =>
      xs.isEmpty || {
        val df = xs.toDF("x")
        val r = df.agg(
          expr("percentile(x, 0.25)"), expr("percentile(x, 0.5)"),
          expr("percentile(x, 0.99)"), min($"x"), max($"x")).head()
        val (p25, p50, p99) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        p25 <= p50 && p50 <= p99 &&
          r.getDouble(3) <= p25 && p99 <= r.getDouble(4)
      }
    })
  }

  test("salted two-phase aggregation equals plain groupBy") {
    check("salted", Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.zipWithIndex
          .map { case ((k, v), i) => (k, v, i.toLong) }
          .toDF("k", "v", "id")
        val plain = df.groupBy($"k")
          .agg(count(lit(1)).as("c"), sum($"v").as("s"))
          .as[(Long, Long, Long)].collect().toSet
        val salted = df
          .withColumn("salt", pmod($"id", lit(4)))
          .groupBy($"k", $"salt")
          .agg(count(lit(1)).as("pc"), sum($"v").as("ps"))
          .groupBy($"k")
          .agg(sum($"pc").as("c"), sum($"ps").as("s"))
          .as[(Long, Long, Long)].collect().toSet
        plain == salted
      }
    })
  }

  test("bloom probe admits every member for arbitrary insert sets (no false negatives)") {
    val setGen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
      .map(_.distinct)
    try check("bloom-no-false-negatives", Prop.forAll(setGen) { vals =>
      val f = org.apache.spark.util.sketch.BloomFilter
        .create(math.max(vals.size.toLong, 1L), 0.01)
      vals.foreach(f.putLong)
      // through the full Spark expression path (serialize, codegen,
      // probe), every inserted value must come back
      val admitted = vals.toDF("h")
        .filter(graft.functions.BloomMightContain(spark, $"h", f))
        .count()
      admitted == vals.size.toLong
    })
    // each trial registered a content-keyed temp function in the
    // SHARED session — drop them so the suite doesn't accrete ~100
    // dead sketch-byte closures (the leak unregisterAll exists for)
    finally graft.functions.BloomMightContain.unregisterAll(spark)
  }
}
