package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native L2 unit normalization of an `array<double>` column — the
  * codegen twin of Llm.unitNormE's higher-order form
  * (`transform(e, x -> x / sqrt(aggregate(transform(e, y -> y*y), …)))`).
  *
  * Same arithmetic in the same index order (sequential sum of
  * squares, one sqrt, per-element divide), so the doubles are bitwise
  * what the HOF produces on every non-degenerate vector (UnitNormSpec
  * pins the raw bits). ONE deliberate divergence: a zero-norm vector
  * makes the HOF form THROW under ANSI mode (Spark 4's default
  * DIVIDE_BY_ZERO), while this form degrades to NaNs — a single
  * degenerate corpus row killing a whole index build is the worse
  * failure mode. What changes otherwise is cost: the HOF is
  * CodegenFallback and allocates two intermediate arrays per ROW,
  * which the round-14 build split measured as a multi-second term on
  * every corpus-scale scan that touches `unit` (the cells-frame
  * materialization alone carried ~30 s of the 66 s x1000 index
  * build). This expression is one fused primitive loop inside
  * whole-stage codegen.
  *
  * Used on the ≥ CoarseAssign.minK quantizer paths, where no
  * small-scale oracle row can see it; the small-k regime keeps the
  * HOF form feeding MLlib bit-for-bit as always.
  */
case class UnitNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  // mirrors the child's element nullability: on a null-free array the
  // result is null-free; a null ELEMENT yields the all-null array the
  // HOF produces (see compute), so claiming containsNull=false there
  // would lie to downstream null-elimination rules
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(DoubleType, containsNull = cn)
    case _ => ArrayType(DoubleType, containsNull = true)
  }

  override def prettyName: String = "unit_norm"

  def compute(v: ArrayData): ArrayData = {
    val n0 = v.numElements()
    // null-element parity with the HOF twin: a null slot nulls the
    // aggregate sum, so sqrt(null) nulls the divisor and EVERY output
    // element — toDoubleArray would instead read the slot as an
    // arbitrary value and emit a finite, differently-normalized
    // vector, silently diverging from the documented bitwise contract
    var ci = 0
    while (ci < n0) {
      if (v.isNullAt(ci)) return new GenericArrayData(new Array[Any](n0))
      ci += 1
    }
    val a = v.toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    val n = math.sqrt(s)
    i = 0
    while (i < a.length) { a(i) /= n; i += 1 }
    new GenericArrayData(a)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unitNorm", this, classOf[UnitNorm].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnitNorm {
  val name = "graft_unit_norm"

  private val info = new ExpressionInfo(classOf[UnitNorm].getName, name)

  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$name expects 1 argument")
    UnitNorm(exprs.head)
  }

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Column face: register-then-call (the expression is stateless, so
    * one fixed name serves every use). */
  def apply(spark: SparkSession,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(name, v)
  }

  def inject(e: SparkSessionExtensions): Unit =
    e.injectFunction((FunctionIdentifier(name), info, builder))
}
