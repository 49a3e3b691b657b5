package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend probe: inflates the sf0.1 fixtures in-place (union with
  * shifted keys — same distributions, x N rows) and times the
  * heavyweight plans on the inflated copy. The point is the TREND: a
  * plan that is ~linear from sf0.1 to sf~1 has no hidden quadratic or
  * driver-side bottleneck, which is the property that carries to a
  * 1000-executor cluster.
  *
  * Usage: runMain graft.tools.ScaleProbe [factor]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = "/root/testdata/sf0.1"
    val dst = Files.createTempDirectory("graft_scaleprobe").toString
    println(s"== inflating sf0.1 x$factor -> $dst")

    def inflate(name: String, keyCols: Seq[String], keySpan: Long): Unit = {
      val base = graft.engine.Tables(spark, src, name)
      val copies = (0 until factor).map { i =>
        keyCols.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * keySpan))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    // key spans chosen beyond each table's max key so copies don't collide
    inflate("lineitem", Seq("l_orderkey"), 10000000L)
    inflate("orders", Seq("o_orderkey"), 10000000L)
    inflate("customer", Seq(), 0L) // dims stay as-is: fact x N, dim fixed
    inflate("nation", Seq(), 0L)
    inflate("supplier", Seq(), 0L)
    inflate("region", Seq(), 0L)
    inflate("events", Seq("event_id"), 10000000L)
    inflate("documents", Seq("doc_id"), 10000000L)
    inflate("embeddings", Seq("vec_id"), 10000000L)

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.count()
      println(f"== $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    import graft.ops._
    time("flagship groupby_multi") { Aggs.aggGroupbyMulti(spark, dst) }
    time("dedup_latest (window)") { Filters.dedupLatest(spark, dst) }
    time("quantile filter") { Filters.filterQuantile(spark, dst) }
    time("topk counts") { Aggs.aggTopkCounts(spark, dst) }
    time("salted agg") { Advanced.aggSalted(spark, dst) }
    time("sessionization") { Advanced.streamSession(spark, dst) }
    time("dedup exact (sha)") { Llm.dedupExact(spark, dst) }
    time("minhash lsh native") { Llm.dedupMinhashNative(spark, dst) }
    time("embed neardup") { Llm.embedNeardup(spark, dst) }
    // round-2 risk list: the iterative clusters loop (cache/lineage
    // hygiene), the IVF quantizer (sampled fit), simhash banding
    time("dedup clusters") { Llm.dedupClusters(spark, dst) }
    time("ann ivf") { Llm.annIvf(spark, dst) }
    time("simhash pairs") { Llm.simhashPairs(spark, dst, 8) }
    // round-2 curation additions: the chunk window (shuffle = full
    // corpus keyed by passage), the broadcast decontamination join,
    // and the Gopher bigram aggregate
    time("chunk dedup") { Llm.chunkDedup(spark, dst) }
    time("decontaminate") { Llm.decontaminate(spark, dst) }
    time("repetition rules") { Llm.repetition(spark, dst) }
    // round-2 batch 2: the binned range join (the binning IS the scale
    // claim — without it this is O(n*m)), the salted shuffle join, the
    // TPC-H macros, and the quality-LR model train+score
    time("binned range join") { Joins.joinRange(spark, dst) }
    time("salted join") { Joins.joinSalted(spark, dst) }
    time("tpch q3") { Joins.tpchQ3(spark, dst) }
    time("tpch q5") { Joins.tpchQ5(spark, dst) }
    time("quality LR") { Llm.qualityLr(spark, dst) }
    time("stream join face") { StreamingOps.streamJoin(spark, dst) }

    spark.stop()
  }
}
