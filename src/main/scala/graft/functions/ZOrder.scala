package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression computing the 2-D Z-order (Morton) value
  * of two integral columns: the low 31 bits of each input interleaved
  * into one non-negative long (`x` on even bit positions, `y` on odd).
  *
  * Why it exists (SURVEY.md §4 data-layout story): sorting by a single
  * column clusters files on that column only — a predicate on the
  * OTHER column still touches every file. Sorting by the Morton value
  * clusters files on small (x, y) rectangles simultaneously, so
  * per-file min/max stats (VersionedTable.commitWithStats) prune scans
  * for range predicates on EITHER dimension. This is the same layout
  * contract as Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * Implementation is the classic mask-shift bit spread — O(1), branch
  * free, whole-stage-codegen'd (the HOF equivalent, a 31-term
  * `aggregate(sequence(...))`, is CodegenFallback and allocates per
  * row; same rationale as [[CosineSimilarity]]). Negative inputs keep
  * only the low 31 magnitude bits by design — callers bucket/offset
  * first (layout keys, not arithmetic).
  */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case LongType | IntegerType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two integral arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder2"

  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrder.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave((long) $a, (long) $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  val name = "zorder2"

  /** Spread the low 31 bits of `v` onto even bit positions. */
  private def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton value: x on even bits, y on odd bits (both low-31). */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  private val info = new ExpressionInfo(classOf[ZOrder].getName, name)

  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name expects 2 arguments")
    ZOrder(exprs.head, exprs(1))
  }

  /** Idempotent per-session SQL registration (`expr("zorder2(x, y)")`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  def inject(e: SparkSessionExtensions): Unit =
    e.injectFunction((FunctionIdentifier(name), info, builder))
}
