package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PqEncode (native) against Llm.pqEncodeExpr (the nested-HOF form) —
  * the claim both encode call sites (AnnIndex.encode, Llm.pqCodesOn)
  * rely on is EXACT code equality: same Math.pow accumulation order,
  * same strict-< first-minimum tie rule, so snapshot-encoded codes
  * keep equaling session-encoded codes after the native swap. */
class PqEncodeSpec extends SparkTestBase {
  import spark.implicits._

  private def hofCodes(df: org.apache.spark.sql.DataFrame,
      cb: Array[Double], m: Int, ks: Int, sub: Int) =
    df.withColumn("cb", typedLit(cb.toSeq))
      .withColumn("hof", expr(graft.ops.Llm.pqEncodeExpr(m, ks, sub)))

  test("native pq_encode equals the HOF encoder code-for-code on " +
      "random unit vectors, including duplicate-centroid tie cases") {
    val rnd = new scala.util.Random(7)
    val m = 4; val ks = 16; val sub = 4
    val cb = Array.fill(m * ks * sub)(rnd.nextGaussian())
    // force ties: duplicate codebook rows 3 and 9 in every subspace —
    // the first-minimum rule must pick 3
    for (j <- 0 until m; t <- 0 until sub)
      cb((j * ks + 9) * sub + t) = cb((j * ks + 3) * sub + t)
    val rows = (0 until 300).map { i =>
      val v = Array.fill(m * sub)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }
    val df = rows.toDF("vec_id", "unit")
    val both = hofCodes(df, cb, m, ks, sub)
      .withColumn("native", PqEncode(spark, col("unit"), cb, m, ks, sub))
      .select("vec_id", "hof", "native").collect()
    for (r <- both)
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: HOF ${r.getSeq[Int](1)} vs " +
          s"native ${r.getSeq[Int](2)}")
  }

  test("exact-tie between distinct rows keeps the lower code (the " +
      "HOF's IF(x.d < acc.d) strict inequality)") {
    val m = 1; val ks = 3; val sub = 2
    // rows 1 and 2 are equidistant mirrors of the input; row 0 is far
    val cb = Array(9.0, 9.0, 1.0, 0.0, -1.0, 0.0)
    val df = Seq((0L, Seq(0.0, 0.0))).toDF("vec_id", "unit")
    val r = hofCodes(df, cb, m, ks, sub)
      .withColumn("native", PqEncode(spark, col("unit"), cb, m, ks, sub))
      .select("hof", "native").head()
    assert(r.getSeq[Int](0) == Seq(1), s"HOF premise changed: ${r.getSeq[Int](0)}")
    assert(r.getSeq[Int](1) == Seq(1), s"native tie rule diverged: ${r.getSeq[Int](1)}")
  }

  test("null element: the subspace covering it keeps the HOF's -1 " +
      "seed, other subspaces encode normally") {
    val m = 2; val ks = 2; val sub = 2
    val rnd = new scala.util.Random(11)
    val cb = Array.fill(m * ks * sub)(rnd.nextGaussian())
    val df = Seq((0L, Seq[java.lang.Double](0.1, null, 0.2, 0.3)))
      .toDF("vec_id", "unit")
    val r = df.withColumn("cb", typedLit(cb.toSeq))
      .withColumn("hof", expr(graft.ops.Llm.pqEncodeExpr(m, ks, sub)))
      .withColumn("native", PqEncode(spark, col("unit"), cb, m, ks, sub))
      .select("hof", "native").head()
    val h = r.getSeq[Int](0)
    val n = r.getSeq[Int](1)
    assert(h.head == -1, s"HOF premise changed: $h")
    assert(h == n, s"HOF $h vs native $n")
  }
}
