package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the round-15 candidate-pruned verify in
  * `Llm.minhashNativePairs` (knob: `Llm.minhashPrunedVerify`): per
  * factor, alternate pruned/full arms so host drift cannot pick the
  * winner. Factor 1 = the raw sf0.1 fixture in place (the bench's
  * scan shape); larger factors inflate documents like IslandsProbe.
  *
  * Usage: runMain graft.tools.MinhashVerifyProbe [factor...]
  *   (default: 1 1 1 30)
  */
object MinhashVerifyProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(1, 1, 1, 30) else args.toSeq.map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-minhash-verify-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    def runOnce(label: String, dir: String, pruned: Boolean): Unit = {
      graft.ops.Llm.minhashPrunedVerify = pruned
      val (err, m) = graft.engine.Metrics.measure(spark)(
        try {
          graft.util.Exec.drain(
            graft.ops.Llm.minhashNativePairs(spark, dir, materialize = false))
          None
        } catch { case t: Throwable =>
          System.err.println(s"== $label FAILED: ${t.toString.take(300)}")
          Some(t)
        })
      if (err.isEmpty)
        println(f"== $label%-26s ${m.wallMs / 1e3}%8.2f s   " +
          f"[shuffleW ${m.shuffleWriteBytes / 1048576}%d MB, " +
          f"spill ${(m.memorySpilledBytes + m.diskSpilledBytes) / 1048576}%d MB, " +
          f"tasks ${m.tasks}%d]")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // untimed warmup (both arms: codegen + reader init)
    runOnce("warmup pruned", src, pruned = true)
    runOnce("warmup full", src, pruned = false)

    for (factor <- factors) {
      val dst =
        if (factor == 1) src
        else {
          val d = Files.createTempDirectory(s"graft_mhv_x$factor").toString
          println(s"== inflating documents x$factor -> $d")
          Inflate.documentsOnly(spark, src, d, factor)
          d
        }
      runOnce(s"x$factor pruned", dst, pruned = true)
      runOnce(s"x$factor full", dst, pruned = false)
      if (factor != 1) graft.util.Fs.deleteRecursively(dst)
    }
    // restore the SHIPPED default (full verify — the pruned arm lost)
    graft.ops.Llm.minhashPrunedVerify = false
    spark.stop()
  }
}
