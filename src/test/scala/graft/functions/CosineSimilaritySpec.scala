package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def df2(a: Seq[Double], b: Seq[Double]) = {
    CosineSimilarity.register(spark)
    Seq((a, b)).toDF("e", "qe")
  }

  test("known geometry: parallel, orthogonal, antiparallel") {
    assert(df2(Seq(1.0, 0.0), Seq(2.0, 0.0))
      .selectExpr("cosine_sim(e, qe)").as[Double].head() == 1.0)
    assert(df2(Seq(1.0, 0.0), Seq(0.0, 3.0))
      .selectExpr("cosine_sim(e, qe)").as[Double].head() == 0.0)
    // norms 1 and 4 are exact in binary, so the result is exactly -1
    assert(df2(Seq(1.0, 0.0), Seq(-4.0, 0.0))
      .selectExpr("cosine_sim(e, qe)").as[Double].head() == -1.0)
    assert(math.abs(df2(Seq(1.0, 2.0), Seq(-1.0, -2.0))
      .selectExpr("cosine_sim(e, qe)").as[Double].head() + 1.0) < 1e-12)
  }

  test("matches the higher-order-function formulation bitwise") {
    CosineSimilarity.register(spark)
    val hof =
      """aggregate(zip_with(e, qe, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
         / (sqrt(aggregate(transform(e, x -> x * x), 0D, (acc, v) -> acc + v))
            * sqrt(aggregate(transform(qe, x -> x * x), 0D, (acc, v) -> acc + v)))"""
    val emb = graft.engine.Tables(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val both = emb.crossJoin(q)
      .select(
        expr("cosine_sim(e, qe)").as("native"),
        expr(hof).as("composed"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, c) => assert(n == c, s"$n != $c") }
  }

  test("null input yields null, type mismatch fails analysis") {
    CosineSimilarity.register(spark)
    val withNull = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("e", "qe")
    assert(withNull.selectExpr("cosine_sim(e, qe)").head().isNullAt(0))
    val bad = Seq(("x", Seq(1.0))).toDF("e", "qe")
    intercept[Exception](bad.selectExpr("cosine_sim(e, qe)").collect())
  }

  test("degenerate inputs are null: length mismatch and zero norm") {
    // codegen path
    assert(df2(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))
      .selectExpr("cosine_sim(e, qe)").head().isNullAt(0))
    assert(df2(Seq(0.0, 0.0), Seq(1.0, 2.0))
      .selectExpr("cosine_sim(e, qe)").head().isNullAt(0))
    assert(df2(Seq(1.0, 2.0), Seq(0.0, 0.0))
      .selectExpr("cosine_sim(e, qe)").head().isNullAt(0))
    // interpreted path (eval through the expression directly)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def lit(v: Array[Double]) =
      Literal.create(ArrayData.toArrayData(v), ArrayType(DoubleType))
    assert(CosineSimilarity(lit(Array(1.0)), lit(Array(1.0, 2.0))).eval() == null)
    assert(CosineSimilarity(lit(Array(0.0)), lit(Array(1.0))).eval() == null)
    assert(CosineSimilarity(lit(Array(3.0)), lit(Array(4.0))).eval() == 1.0)
  }

  test("participates in whole-stage codegen (no fallback)") {
    CosineSimilarity.register(spark)
    val emb = graft.engine.Tables(spark, sfSmoke, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
    val plan = emb.selectExpr("cosine_sim(e, e) AS c")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosine_sim"), plan.take(500))
  }
}
