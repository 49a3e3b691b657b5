package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** UnitNorm (native) against Llm.unitNormE (the HOF form) — the claim
  * both call sites rely on is BITWISE equality, so the comparison is
  * on raw double bits, which also pins the degenerate zero-norm case
  * (both produce NaNs, which value equality cannot compare). */
class UnitNormSpec extends SparkTestBase {
  import spark.implicits._

  test("native unit_norm is bitwise the HOF unitNormE on every " +
      "non-degenerate vector") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian() * (1 + i % 5)))
    }
    val df = rows.toDF("vec_id", "e")
    val both = df
      .withColumn("hof", expr(graft.ops.Llm.unitNormE))
      .withColumn("native", UnitNorm(spark, col("e")))
      .select("vec_id", "hof", "native")
      .collect()
    for (r <- both) {
      val h = r.getSeq[Double](1)
      val n = r.getSeq[Double](2)
      assert(h.length == n.length, s"vec ${r.getLong(0)} length")
      for (i <- h.indices)
        assert(java.lang.Double.doubleToRawLongBits(h(i)) ==
          java.lang.Double.doubleToRawLongBits(n(i)),
          s"vec ${r.getLong(0)} elem $i: ${h(i)} vs ${n(i)}")
    }
  }

  test("null element: native matches the HOF — the sum goes null, so " +
      "EVERY output element is null") {
    val df = Seq((0L, Seq[java.lang.Double](1.0, null, 3.0)))
      .toDF("vec_id", "e")
    val r = df
      .withColumn("hof", expr(graft.ops.Llm.unitNormE))
      .withColumn("native", UnitNorm(spark, col("e")))
      .select("hof", "native").head()
    val h = r.getSeq[java.lang.Double](0)
    val n = r.getSeq[java.lang.Double](1)
    assert(h.length == 3 && n.length == 3, "length must be preserved")
    assert(h.forall(_ == null), s"HOF premise changed: $h")
    assert(n.forall(_ == null),
      s"native must null-out like the HOF, got $n")
  }

  test("zero-norm: HOF form THROWS under ANSI, native form degrades " +
      "to NaNs — the one deliberate divergence") {
    val df = Seq((0L, Seq.fill(16)(0.0))).toDF("vec_id", "e")
    // SparkArithmeticException is private[spark] in its Scala
    // signature; assert through the public face instead — the throw
    // (or its cause chain, if the scheduler wraps it) must be the
    // ANSI divide-by-zero ArithmeticException.
    val ex = intercept[Exception] {
      df.withColumn("hof", expr(graft.ops.Llm.unitNormE)).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).take(8).toSeq
    assert(chain.exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException in the cause chain, got: " +
        chain.map(_.getClass.getName).mkString(" <- "))
    val n = df.withColumn("native", UnitNorm(spark, col("e")))
      .select("native").head().getSeq[Double](0)
    assert(n.forall(_.isNaN),
      s"native zero-norm must yield NaNs (a query-killing throw on one " +
        s"degenerate corpus row is the worse failure mode), got $n")
  }
}
