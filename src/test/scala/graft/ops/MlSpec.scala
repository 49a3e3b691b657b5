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
    assert(got.keySet.subsetOf(Set("high", "mid", "low")))
    assert(got.values.sum == 6000L)
  }
}
