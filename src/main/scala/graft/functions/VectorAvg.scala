package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise vector mean — the `Aggregator` face of the
  * centroid computation (SURVEY.md §2.12: custom UDAF surface reserved
  * for vector aggregations). The relational face (posexplode + groupBy
  * avg) is the oracle-checked `q_llm_centroids`; this typed form is for
  * `Dataset` pipelines that want a single-pass centroid without the
  * explode fan-out (dim x rows intermediate). */
object VectorAvg {

  case class Buf(sum: Array[Double], n: Long)

  def apply(dim: Int): Aggregator[Seq[Double], Buf, Seq[Double]] =
    new Aggregator[Seq[Double], Buf, Seq[Double]] {

      override def zero: Buf = Buf(Array.fill(dim)(0.0), 0L)

      override def reduce(b: Buf, a: Seq[Double]): Buf = {
        var i = 0
        while (i < dim && i < a.length) {
          b.sum(i) += a(i)
          i += 1
        }
        Buf(b.sum, b.n + 1)
      }

      override def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < dim) {
          x.sum(i) += y.sum(i)
          i += 1
        }
        Buf(x.sum, x.n + y.n)
      }

      override def finish(b: Buf): Seq[Double] =
        if (b.n == 0L) Seq.empty
        else b.sum.map(_ / b.n).toSeq

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]

      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }
}
