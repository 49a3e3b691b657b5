package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns.
  *
  * Rationale (SURVEY.md §2.12 policy): the composed higher-order form
  * (`aggregate(zip_with(...))` three times per row) is CodegenFallback
  * and allocates per element; this expression participates in
  * whole-stage codegen with one fused primitive loop — the preference
  * ladder is (a) compose built-ins, (b) custom `Expression` when the
  * built-ins fall off the codegen path, which is exactly the case here.
  *
  * Accumulation is sequential per accumulator (dot, |a|^2, |b|^2), so
  * results are bitwise-identical to DuckDB's
  * `list_dot_product(a,b)/(sqrt(list_dot_product(a,a))*sqrt(list_dot_product(b,b)))`
  * — the oracle gate stays exact.
  *
  * Degenerate inputs are NULL, never NaN/Infinity: mismatched vector
  * lengths (DuckDB's list_dot_product errors on these; we surface null
  * instead of silently truncating) and zero-norm vectors (0/0). Both
  * the interpreted and codegen paths agree.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // may return null for non-null inputs (length mismatch / zero norm)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  private def compute(x: Array[Double], y: Array[Double]): Any = {
    if (x.length != y.length) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < x.length) {
      dot += x(i) * y(i)
      na += x(i) * x(i)
      nb += y(i) * y(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(
      a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    $dot += $x[$i] * $y[$i];
         |    $na += $x[$i] * $x[$i];
         |    $nb += $y[$i] * $y[$i];
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "cosine_sim"

  private val info = new ExpressionInfo(
    classOf[CosineSimilarity].getName, name)

  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name expects 2 arguments")
    CosineSimilarity(exprs.head, exprs(1))
  }

  /** Idempotent per-session SQL registration; after this,
    * `expr("cosine_sim(a, b)")` / SQL text resolves natively. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** `spark.sql.extensions`-style wiring for sessions built with
    * `.withExtensions(new GraftExtensions)`. */
  def inject(e: SparkSessionExtensions): Unit =
    e.injectFunction((FunctionIdentifier(name), info, builder))
}

/** Session extension registering graft's native functions:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    CosineSimilarity.inject(e)
    ZOrder.inject(e)
  }
}
