package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The measurement harness behind the round-13 IVF-quantizer init
  * decision (k-means|| retired for random in Llm.fitIvfCellsOn) —
  * committed so the BASELINE.md numbers stay reproducible:
  *
  *  - `fit [factor...]` — init-mode head-to-head mirroring
  *    fitIvfCellsOn exactly (100k-capped seeded sample fit,
  *    k = ceil(sqrt(n)), 8 Lloyd passes, transform-all): wall, Spark
  *    job count, training cost, largest cell, per mode x 2 reps
  *    (rep 1 absorbs first-touch class loading — read rep 2).
  *    factor > 1 inflates embeddings first (Inflate.embeddingsOnly).
  *  - `recall` — mean top-10 recall of the production probe rule
  *    (own cell + (nprobe-1) best non-own by centroid cosine) vs
  *    driver-side brute force over 50 seeded random query vectors,
  *    per init mode, at sf0.001 and sf0.1. The multi-query number a
  *    single fixed-query spec floor cannot provide.
  *
  * Round-13 readings: fit at x300 (600k vectors, k=775) k-means||
  * 11.1-15.3 s / 27 jobs vs random 8.1-8.4 s / 22 jobs, cost within
  * 0.05%, random's largest cell better balanced (884 vs 950); recall
  * 63.4% vs 62.0% (sf0.001), 66.2% vs 68.2% (sf0.1) — parity. The
  * parallel init refines placement a PROBE-COVERED coarse quantizer
  * never exploits.
  *
  * Usage: runMain graft.tools.QuantizerProbe fit [factor...]
  *        runMain graft.tools.QuantizerProbe recall
  */
object QuantizerProbe {
  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def unitized(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    spark.read.parquet(path)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      // the PRODUCTION normalization expression, not a copy: this
      // harness exists to keep the init-decision numbers reproducible
      // against the quantizer path, so a future guard landing in
      // unitNormE must flow through here too
      .withColumn("unit", expr(graft.ops.Llm.unitNormE))
      .withColumn("features", array_to_vector(col("unit")))
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("recall") => recallMain()
    case Some("assign") => assignMain(args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(30, 100); case fs => fs
    })
    case Some("build") => buildMain(args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(300, 1000); case fs => fs
    })
    case _ => fitMain(args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(300); case fs => fs
    })
  }

  /** The round-14 two-level-assign decision table: at inflated probe
    * scales (the pruned plan only engages above CoarseAssign.minK
    * centroids), price exact transform-all against CoarseAssign.pruned
    * on the SAME fitted quantizer — wall, cell agreement, and natural
    * top-10 recall of the production probe rule under BOTH assignment
    * sets (50 seeded queries, driver-side exact ground truth). */
  private def assignMain(factors: Seq[Int]): Unit = {
    val spark = session()
    import org.apache.spark.ml.clustering.KMeans
    val src = "/root/testdata/sf0.1"
    for (factor <- factors) {
      val dir =
        if (factor <= 1) src
        else {
          val d = java.nio.file.Files
            .createTempDirectory(s"qprobe_asg_x$factor").toString
          Inflate.embeddingsOnly(spark, src, d, factor)
          d
        }
      val emb = unitized(spark, s"$dir/embeddings.parquet")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = emb.count()
      val k = math.max(8, math.ceil(math.sqrt(total.toDouble)).toInt)
      val nprobe = math.max(2, math.ceil(k / 4.0).toInt)
      val fitCap = 100000L
      val fitInput = (if (total > fitCap)
          emb.sample(withReplacement = false,
            fraction = fitCap.toDouble / total, seed = 42L)
        else emb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = new KMeans().setK(k).setSeed(42).setMaxIter(8)
        .setInitMode("random")
        .setFeaturesCol("features").setPredictionCol("cell")
        .fit(fitInput)
      fitInput.unpersist()
      val cents = model.clusterCenters.map(_.toArray)
      // warm rep absorbs codegen/reader init; read rep 2. Exec.drain,
      // NOT count(): a count action lets Catalyst prune the predicted
      // `cell` column away entirely — the first round-14 cut timed
      // 0.12-0.25 s "transforms" that computed no assignment at all
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.util.Exec.drain(
          model.transform(emb).select(col("vec_id"), col("cell")))
        val tEx = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.util.Exec.drain(graft.engine.CoarseAssign.pruned(
            emb.select(col("vec_id"), col("e")),
            cents.zipWithIndex.map { case (c, i) => (i, c) })
          .select(col("vec_id"), col("cell")))
        val tPr = (System.nanoTime() - t1) / 1e9
        println(f"QPROBE assign x$factor rep$rep n=$total k=$k " +
          f"exact ${tEx}%7.2f s  pruned ${tPr}%7.2f s " +
          f"  speedup ${tEx / tPr}%.2fx")
      }
      val exMap = model.transform(emb).select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val prMap = graft.engine.CoarseAssign.pruned(
          emb.select(col("vec_id"), col("e")),
          cents.zipWithIndex.map { case (c, i) => (i, c) })
        .select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val agree = exMap.count { case (id, c) => prMap.get(id).contains(c) }
      println(f"QPROBE assign x$factor agreement ${agree * 100.0 / exMap.size}%5.2f%% " +
        f"(${exMap.size - agree} of ${exMap.size} differ)")
      // natural recall under both assignment sets — ground truth
      // brute-forced driver-side (x100 = 200k vectors = ~100 MB of
      // doubles; within the probe heap)
      val all = emb.select(col("vec_id"), col("unit")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val rnd = new scala.util.Random(7)
      val qids = rnd.shuffle(all.map(_._1).toList).take(50)
      val byId = all.toMap
      for ((label, asg) <- Seq(("exact", exMap), ("pruned", prMap))) {
        var tot = 0; var hit = 0
        for (qid <- qids) {
          val qu = byId(qid)
          val scoredAll = all.filter(_._1 != qid)
            .map { case (id, v) => (id, cos(qu, v)) }
          val exact10 = scoredAll.sortBy { case (id, s) => (-s, id) }
            .take(10).map(_._1).toSet
          val qcell = asg(qid)
          val ranked = cents.zipWithIndex.filter(_._2 != qcell)
            .sortBy { case (c, i) =>
              val cn = math.sqrt(c.map(x => x * x).sum)
              (-cos(qu, c) / math.max(cn, 1e-12), i) }
            .map(_._2).take(nprobe - 1)
          val probed = Set(qcell) ++ ranked
          val approx = scoredAll
            .filter { case (id, _) => probed.contains(asg(id)) }
            .sortBy { case (id, s) => (-s, id) }
            .take(10).map(_._1).toSet
          tot += 10; hit += (exact10 & approx).size
        }
        println(f"QPROBE assign x$factor recall($label%-6s) " +
          f"${hit * 100.0 / tot}%5.1f%% (k=$k nprobe=$nprobe)")
      }
      emb.unpersist()
      if (factor > 1) graft.util.Fs.deleteRecursively(dir)
    }
    spark.stop()
  }

  private def fitMain(factors: Seq[Int]): Unit = {
    val spark = session()
    import org.apache.spark.ml.clustering.KMeans
    val src = "/root/testdata/sf0.1"
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    for (factor <- factors) {
      val dir =
        if (factor <= 1) src
        else {
          val d = java.nio.file.Files
            .createTempDirectory(s"qprobe_x$factor").toString
          Inflate.embeddingsOnly(spark, src, d, factor)
          d
        }
      val emb = unitized(spark, s"$dir/embeddings.parquet")
      val total = emb.count()
      val k = math.max(8, math.ceil(math.sqrt(total.toDouble)).toInt)
      val fitCap = 100000L
      println(s"QPROBE fit x$factor n=$total k=$k")
      val fitInput = (if (total > fitCap)
          emb.sample(withReplacement = false,
            fraction = fitCap.toDouble / total, seed = 42L)
        else emb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fitInput.count()
      for (rep <- 1 to 2; mode <- Seq("k-means||", "random")) {
        val j0 = jobs.get; val t0 = System.nanoTime()
        val model = new KMeans().setK(k).setSeed(42).setMaxIter(8)
          .setInitMode(mode)
          .setFeaturesCol("features").setPredictionCol("cell")
          .fit(fitInput)
        val dt = (System.nanoTime() - t0) / 1e9
        val nj = jobs.get - j0
        val r = model.transform(emb).groupBy(col("cell")).count()
          .agg(max(col("count")), count(lit(1))).head()
        println(f"QPROBE rep$rep $mode%-10s fit ${dt}%7.2f s jobs=$nj%3d" +
          f"  largest=${r.getLong(0)}%7d cells=${r.getLong(1)}%5d" +
          f" cost=${model.summary.trainingCost}%12.1f")
      }
      fitInput.unpersist()
      if (factor > 1) graft.util.Fs.deleteRecursively(dir)
    }
    spark.stop()
  }

  /** Phase split of the committed-index BUILD at deep scale — the
    * round-13 verdict attributed the x1000 build/fit rows (128/131 s)
    * to the assign-all term; this mode measures the attribution
    * instead of trusting it: fit (KMeans on the capped sample), the
    * corpus assign under BOTH rules (exact transform-all vs the
    * two-level pruned kernel), and the cell-clustered commit, each
    * timed apart with the Metrics counters. */
  private def buildMain(factors: Seq[Int]): Unit = {
    val spark = session()
    import org.apache.spark.ml.clustering.KMeans
    val src = "/root/testdata/sf0.1"
    def timed(label: String)(thunk: => Unit): Unit = {
      val (err, m) = graft.engine.Metrics.measure(spark)(
        try { thunk; None } catch { case t: Throwable =>
          System.err.println(s"QPROBE build $label FAILED: ${t.toString.take(300)}")
          Some(t) })
      if (err.isEmpty)
        println(f"QPROBE build $label%-22s ${m.wallMs / 1e3}%8.2f s  " +
          f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, " +
          f"spill ${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576}%d MB, " +
          f"tasks ${m.tasks}%d]")
    }
    for (factor <- factors) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"qprobe_bld_x$factor").toString
      Inflate.embeddingsOnly(spark, src, dir, factor)
      val emb = unitized(spark, s"$dir/embeddings.parquet")
      val total = emb.count()
      val k = math.max(8, math.ceil(math.sqrt(total.toDouble)).toInt)
      val fitCap = 100000L
      println(s"QPROBE build x$factor n=$total k=$k")
      val fitInput = (if (total > fitCap)
          emb.sample(withReplacement = false,
            fraction = fitCap.toDouble / total, seed = 42L)
        else emb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var model: org.apache.spark.ml.clustering.KMeansModel = null
      timed(s"x$factor fit mllib") {
        model = new KMeans().setK(k).setSeed(42).setMaxIter(8)
          .setInitMode("random")
          .setFeaturesCol("features").setPredictionCol("cell")
          .fit(fitInput)
      }
      fitInput.unpersist()
      // the PRODUCTION ≥minK fit: two-level Lloyd on the same capped
      // sample (CoarseAssign.fitCentroids mirrors fitIvfCellsOn's
      // sampling exactly)
      var twoLevel: Array[Array[Double]] = null
      timed(s"x$factor fit twolevel") {
        twoLevel = graft.engine.CoarseAssign.fitCentroids(
          (if (total > fitCap)
            emb.sample(withReplacement = false,
              fraction = fitCap.toDouble / total, seed = 42L)
          else emb).select(col("vec_id"), col("e")), k)
      }
      timed(s"x$factor assign exact") {
        graft.util.Exec.drain(
          model.transform(emb).select(col("vec_id"), col("cell")))
      }
      val cents = twoLevel.zipWithIndex.map { case (c, i) => (i, c) }
      timed(s"x$factor assign pruned") {
        graft.util.Exec.drain(graft.engine.CoarseAssign.pruned(
            emb.select(col("vec_id"), col("e")), cents)
          .select(col("vec_id"), col("cell")))
      }
      // natural recall of the production pairing (two-level fit +
      // pruned assign + probe rule over its own centers) against the
      // MLlib-fit exact-assign baseline — ground truth driver-side,
      // feasible to ~700k vectors
      if (total <= 700000L) {
        val exMap = model.transform(emb).select(col("vec_id"), col("cell"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val prMap = graft.engine.CoarseAssign.pruned(
            emb.select(col("vec_id"), col("e")), cents)
          .select(col("vec_id"), col("cell"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val all = emb.select(col("vec_id"), col("unit")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }; s
        }
        val nprobe = math.max(2, math.ceil(k / 4.0).toInt)
        val rnd = new scala.util.Random(7)
        val qids = rnd.shuffle(all.map(_._1).toList).take(50)
        val byId = all.toMap
        val mlCents = model.clusterCenters.map(_.toArray)
        for ((label, asg, cc) <- Seq(
            ("mllib+exact", exMap, mlCents),
            ("twolevel+pruned", prMap, twoLevel))) {
          var tot = 0; var hit = 0
          for (qid <- qids) {
            val qu = byId(qid)
            val scoredAll = all.filter(_._1 != qid)
              .map { case (id, v) => (id, cos(qu, v)) }
            val exact10 = scoredAll.sortBy { case (id, s) => (-s, id) }
              .take(10).map(_._1).toSet
            val qcell = asg(qid)
            val ranked = cc.zipWithIndex.filter(_._2 != qcell)
              .sortBy { case (c, i) =>
                val cn = math.sqrt(c.map(x => x * x).sum)
                (-cos(qu, c) / math.max(cn, 1e-12), i) }
              .map(_._2).take(nprobe - 1)
            val probed = Set(qcell) ++ ranked
            val approx = scoredAll
              .filter { case (id, _) => probed.contains(asg(id)) }
              .sortBy { case (id, s) => (-s, id) }
              .take(10).map(_._1).toSet
            tot += 10; hit += (exact10 & approx).size
          }
          println(f"QPROBE build x$factor recall($label%-15s) " +
            f"${hit * 100.0 / tot}%5.1f%% (k=$k nprobe=$nprobe)")
        }
      }
      val cells = graft.engine.CoarseAssign.pruned(
          emb.select(col("vec_id"), col("e")), cents)
        .select(col("vec_id"), col("e"), col("cell"))
      val tbl = java.nio.file.Files
        .createTempDirectory(s"qprobe_bldtbl_x$factor").toString
      timed(s"x$factor commit") {
        graft.engine.VersionedTable.commit(
          cells.repartition(col("cell")).sortWithinPartitions(col("cell")),
          tbl)
      }
      graft.util.Fs.deleteRecursively(tbl)
      graft.util.Fs.deleteRecursively(dir)
    }
    spark.stop()
  }

  private def recallMain(): Unit = {
    val spark = session()
    import org.apache.spark.ml.clustering.KMeans
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val emb = unitized(spark, s"$dir/embeddings.parquet").persist()
      val n = emb.count()
      val k = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
      val nprobe = math.max(2, math.ceil(k / 4.0).toInt)
      // fixtures are small enough for driver-side exact brute force —
      // that is the POINT of this harness (ground truth per query)
      val all = emb.select(col("vec_id"), col("unit")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      for (mode <- Seq("k-means||", "random")) {
        val model = new KMeans().setK(k).setSeed(42).setMaxIter(8)
          .setInitMode(mode)
          .setFeaturesCol("features").setPredictionCol("cell")
          .fit(emb)
        val cents = model.clusterCenters.map(_.toArray)
        val assigned = model.transform(emb)
          .select(col("vec_id"), col("cell")).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val rnd = new scala.util.Random(7)
        val qids = rnd.shuffle(all.map(_._1).toList).take(50)
        var tot = 0; var hit = 0
        for (qid <- qids) {
          val qu = all.find(_._1 == qid).get._2
          val exact = all.filter(_._1 != qid)
            .sortBy { case (id, v) => (-cos(qu, v), id) }
            .take(10).map(_._1).toSet
          val qcell = assigned(qid)
          // the production rankProbes rule: own + (nprobe-1) best
          // non-own centroids by cosine (norm-invariant in the query)
          val ranked = cents.zipWithIndex.filter(_._2 != qcell)
            .sortBy { case (c, i) =>
              val cn = math.sqrt(c.map(x => x * x).sum)
              (-cos(qu, c) / math.max(cn, 1e-12), i) }
            .map(_._2).take(nprobe - 1)
          val probed = Set(qcell) ++ ranked
          val approx = all.filter { case (id, _) =>
            id != qid && probed.contains(assigned(id)) }
            .sortBy { case (id, v) => (-cos(qu, v), id) }
            .take(10).map(_._1).toSet
          tot += 10; hit += (exact & approx).size
        }
        println(f"QPROBE recall $dir%-28s $mode%-10s n=$n%7d k=$k%4d" +
          f" nprobe=$nprobe%3d recall=${hit * 100.0 / tot}%5.1f%%")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
