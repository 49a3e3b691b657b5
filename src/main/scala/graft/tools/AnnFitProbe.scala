package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14: split the committed-index cold rows into fit / commit /
  * pq / serve, and price the sub-minK MLlib fit against a driver-side
  * Lloyd prototype (same sample, same k) — wall + cells-quality
  * (cost = mean squared distance to the assigned centroid). */
object AnnFitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    def tt[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"AFP $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val emb = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val (q, cells) = tt("fitIvfCellsOn (MLlib path)") {
      val r = graft.ops.Llm.fitIvfCellsOn(spark, emb)
      r._2.count(); r
    }
    println(s"AFP   k=${q.k}")
    val tmp = graft.util.Fs.tempDir("graft_afp_idx")
    tt("build total (incl fit memo?)") {
      graft.engine.AnnIndex.build(spark, emb, tmp)
    }
    tt("buildPq") { graft.engine.AnnIndex.buildPq(spark, tmp) }
    val qe = emb.filter(col("vec_id") === 0).select(col("e"))
      .head().getAs[scala.collection.Seq[Double]](0).toSeq
    tt("queryPq") {
      graft.util.Exec.drain(
        graft.engine.AnnIndex.queryPq(spark, tmp, qe, 10, Some(0L)))
    }
    // driver-side Lloyd prototype on the same data
    val t0 = System.nanoTime()
    val rows = emb.select(col("vec_id"),
        graft.functions.UnitNorm(spark, col("e")).as("u"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray))
    val n = rows.length
    val k = q.k
    // seed: hash-ordered rows (the fitCentroids rule)
    val seeded = rows.sortBy(r => r._1 * 0x9E3779B97F4A7C15L).take(k)
      .map(_._2.clone)
    println(f"AFP collect+seed              ${(System.nanoTime() - t0) / 1e9}%6.2f s (n=$n k=$k)")
    val t1 = System.nanoTime()
    var centers = seeded
    (1 to 8).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](rows.head._2.length))
      val cnts = new Array[Long](k)
      rows.foreach { case (_, u) =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var t = 0
          val ce = centers(c)
          while (t < u.length) { val x = u(t) - ce(t); d += x * x; t += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        val s = sums(best); var t = 0
        while (t < u.length) { s(t) += u(t); t += 1 }
        cnts(best) += 1
      }
      centers = centers.indices.map { c =>
        if (cnts(c) == 0) centers(c)
        else sums(c).map(_ / cnts(c))
      }.toArray
    }
    println(f"AFP driver lloyd 8 iters      ${(System.nanoTime() - t1) / 1e9}%6.2f s")
    spark.stop()
  }
}
