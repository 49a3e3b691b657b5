package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixture inflater shared by the scale probes and the comparative
  * anchor: facts are unioned x N with shifted keys (same
  * distributions, N x rows; spans chosen beyond each table's max key
  * so copies never collide), dims are written ONCE (unioning N
  * unshifted dim copies would fan every dim join out x N — a probe
  * artifact masquerading as superlinear engine behavior), and
  * documents get a per-copy vocabulary prefix so the duplicate RATE
  * stays constant while the corpus grows (copying identical text
  * would grow candidate pairs quadratically — that measures the
  * fixture, not the engine). */
object Inflate {
  def apply(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def inflate(name: String, keyCols: Seq[String], keySpan: Long): Unit = {
      val base = graft.engine.Tables(spark, src, name)
      val out =
        if (keyCols.isEmpty) base
        else (0 until factor).map { i =>
          keyCols.foldLeft(base) { (df, k) =>
            df.withColumn(k, col(k) + lit(i * keySpan))
          }
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    inflate("lineitem", Seq("l_orderkey"), 10000000L)
    inflate("orders", Seq("o_orderkey"), 10000000L)
    inflate("customer", Seq(), 0L)
    inflate("nation", Seq(), 0L)
    inflate("supplier", Seq(), 0L)
    inflate("region", Seq(), 0L)
    inflate("part", Seq(), 0L)
    inflate("events", Seq("event_id"), 10000000L)
    locally {
      val base = graft.engine.Tables(spark, src, "documents")
      (0 until factor).map { i =>
        val shifted = base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        if (i == 0) shifted
        else shifted.withColumn("text", concat_ws(" ",
          expr(s"transform(split(text, ' '), w -> concat('c${i}_', w))")))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    }
    // embeddings keep identical vectors across copies: embed_neardup's
    // exact baseline has a genuinely quadratic pair space; LSH/IVF are
    // the at-scale paths.
    inflate("embeddings", Seq("vec_id"), 10000000L)
  }

  /** Inflate `src` x `factor` into `dst` unless a completed inflation
    * at exactly this factor is already there. The marker is written
    * AFTER the full inflation — gating on the first-written table
    * would happily "reuse" an interrupted inflation, or a completed
    * one from a DIFFERENT factor, and time against wrong-scale data;
    * stale other-factor markers are cleared before inflating. */
  def ensure(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val marker = new java.io.File(s"$dst/_INFLATED_x$factor")
    if (marker.exists()) println(s"== reusing inflated tables at $dst")
    else {
      Option(new java.io.File(dst).listFiles()).foreach(
        _.filter(_.getName.startsWith("_INFLATED_x")).foreach(_.delete()))
      println(s"== inflating $src x$factor -> $dst")
      apply(spark, src, dst, factor)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
  }
}
