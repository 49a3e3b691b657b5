package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership test against a pre-built Bloom sketch.
  *
  * The 100 TB decontamination / incremental-dedup motion: a reference
  * set (eval-benchmark n-grams, yesterday's corpus signatures) can be
  * far too large to broadcast exactly, but its Bloom sketch is a few
  * MB at any cardinality — build it once with `df.stat.bloomFilter`
  * (a distributed treeAggregate; only the fused sketch returns to the
  * driver), embed it in this expression, and the corpus scan filters
  * map-only with zero shuffle. Bloom filters have NO false negatives,
  * so `bloom(x) == false` is a safe drop; the survivors (true hits +
  * the fpp sliver) flow into an exact confirm join whose input is now
  * a tiny fraction of the corpus. Result sets stay EXACT — the sketch
  * only prunes work, never decides membership.
  *
  * Spark's own runtime-filter rewrite injects the same construct
  * automatically inside one query (see PlansSpec's runtime-bloom
  * guard); this expression makes the sketch a first-class REUSABLE
  * artifact that outlives the query that built it.
  *
  * The sketch bytes ride the serialized expression to executors; the
  * filter object deserializes once per JVM via the lazy val (and once
  * per codegen instance via the lazy init in generated code), so the
  * per-row cost is two xxhash probes into a local bit array —
  * codegen-friendly, stays inside WholeStageCodegen.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint digest argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the deserialized filter, not the bytes: one probe call
    // per row, no per-row stream decoding
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-API face: `BloomMightContain(spark, xxhash64(col), sketch)`.
    *
    * The expression carries non-SQL state (the sketch bytes), so the
    * bridge is a per-sketch temp-function registration whose builder
    * closes over the bytes, invoked through the public
    * `call_function` — the same registry seam CosineSimilarity/ZOrder
    * use. The name keys on a 128-bit prefix of the sketch's SHA-256,
    * so re-registering the same sketch is idempotent and two
    * simultaneously-live distinct sketches cannot practically
    * collide. */
  def apply(spark: SparkSession, digest: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    val bytes = bos.toByteArray
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val name = "graft_bloom_mc_" +
      sha.take(16).map(b => f"$b%02x").mkString
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, s"$name expects 1 argument")
        BloomMightContain(exprs.head, bytes)
      },
      "built-in")
    org.apache.spark.sql.functions.call_function(name, digest)
  }

  /** Drop every sketch registration this object made in `spark`.
    *
    * Registration is content-keyed, so re-probing the same sketch is
    * free; but a long-lived session that keeps REFRESHING sketches
    * (daily decontamination, streaming gates) accretes one registry
    * entry — with its captured sketch bytes — per distinct sketch.
    * The entry is only needed until the consuming plan is ANALYZED
    * (the expression then carries the bytes itself), so call this at
    * refresh boundaries, after the previous cycle's results are
    * materialized. Returns the number of entries dropped. */
  def unregisterAll(spark: SparkSession): Int = {
    val reg = spark.sessionState.functionRegistry
    val stale = reg.listFunction()
      .filter(_.funcName.startsWith("graft_bloom_mc_"))
    stale.foreach(reg.dropFunction)
    stale.size
  }
}
