package graft.ops

import graft.SparkTestBase

class MlSpec extends SparkTestBase {
  import spark.implicits._

  test("kmeans clusters all rows into k=3 with stable seed") {
    val a = Ml.mlKmeans(spark, sfSmoke).collect()
    assert(a.length == 3)
    assert(a.map(_.getLong(1)).sum == 6000L) // sf0.001 lineitem rows
    // same seed + same data => identical result
    val b = Ml.mlKmeans(spark, sfSmoke).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("rule-based phase label partitions all rows") {
    val got = Ml.mlPhaseLabel(spark, sfSmoke)
      .select($"phase", $"n").as[(String, Long)].collect().toMap
    // EXACT per-phase counts recomputed from the threshold rule — a
    // subset+total check passes even when every row collapses into
    // one phase (an inverted comparison in the when-chain)
    val expected = graft.engine.Tables(spark, sfSmoke, "lineitem")
      .select($"l_discount").as[Double].collect()
      .groupBy(d => if (d > 0.06) "high" else if (d < 0.03) "low" else "mid")
      .map { case (k, v) => k -> v.length.toLong }
    assert(got == expected, s"got $got want $expected")
    assert(got.values.sum == 6000L)
  }
}
