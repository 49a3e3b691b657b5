package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Round-14: decompose the q_ml_phase_rows fit cascade and A/B the
  * k-means|| init against random init — same seed, same sample, same
  * Lloyd — comparing wall AND the downstream phase-label counts that
  * the declared queries actually emit. */
object KmProbe {
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
      println(f"KM $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val li = Tables(spark, dir, "lineitem").select(
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount"))
      .setOutputCol("features_raw").transform(li.repartition(8))
    val scaled = tt("scaler fit+transform") {
      val s = new StandardScaler().setInputCol("features_raw")
        .setOutputCol("features").setWithMean(true).setWithStd(true)
        .fit(assembled).transform(assembled)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val total = Tables(spark, dir, "lineitem").count()
    val fitInput =
      if (total > 100000L) scaled.sample(false, 100000.0 / total, 42L)
      else scaled
    def phases(initMode: String): Map[String, Long] = {
      val model = tt(s"kmeans fit $initMode") {
        new KMeans().setK(3).setSeed(42).setInitMode(initMode)
          .setFeaturesCol("features").setPredictionCol("phase_cluster")
          .fit(fitInput)
      }
      println(s"KM   iters=${model.summary.numIter} centers=" +
        model.clusterCenters.map(_.toArray.map(x => f"$x%.6f").mkString(","))
          .mkString(" | "))
      val clustered = tt(s"transform+agg $initMode") {
        model.transform(scaled)
          .groupBy(col("phase_cluster"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("l_discount")), 4).as("avg_disc"))
          .collect()
          .map(r => (f"${r.getDouble(2)}%.4f", r.getLong(1))).toMap
      }
      clustered.map { case (k, v) => (k, v) }
    }
    val a = phases("k-means||")
    val b = phases("random")
    println(s"KM phases parallel=$a")
    println(s"KM phases random  =$b")
    println(s"KM EQUAL=${a == b}")
    spark.stop()
  }
}
