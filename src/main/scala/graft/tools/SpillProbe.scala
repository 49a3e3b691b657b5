package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memory-bounded realism probe: run the heavy dedup plans at an
  * inflated factor inside a DELIBERATELY SMALL heap and prove they
  * SPILL rather than OOM — the property that actually carries to a
  * 100 TB cluster, where per-task memory is always scarcer than the
  * data. The trend probes (ScaleProbe) time these plans with a roomy
  * heap; this one caps it (pass -Xmx on the invoking JVM — the probe
  * prints what it got) and reports the spill counters that prove the
  * pressure was real.
  *
  * Usage:
  *   java -Xmx2g <add-opens from build.sbt> \
  *     -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
  *     graft.tools.SpillProbe [factor]
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    // optional: [dstDir] [confKey confVal ...] — reuse an inflated dir
    // and override SQL confs for diagnosis runs
    val dstArg = args.lift(1).filter(_.startsWith("/"))
    val confPairs = args.drop(if (dstArg.isDefined) 2 else 1)
      .grouped(2).collect { case Array(k, v) => (k, v) }.toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"== spill probe: heap ${heapMb} MB, factor x$factor")
    // the claim is spill-NOT-OOM under real memory pressure: a roomy
    // heap (e.g. an sbt-launched JVM) completes everything with zero
    // spill and records a pass that proves nothing — refuse to run
    require(heapMb <= 3072,
      s"SpillProbe needs a capped heap (got $heapMb MB) — " +
        "invoke bare-java with -Xmx2g per the usage doc")

    confPairs.foreach { case (k, v) =>
      println(s"== conf override $k=$v"); spark.conf.set(k, v)
    }
    val dst = dstArg.getOrElse {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_spill_x$factor").toString
      println(s"== inflating sf0.1 x$factor -> $d")
      Inflate(spark, "/root/testdata/sf0.1", d, factor)
      d
    }

    var failed = false
    def probe(name: String,
        onMetrics: graft.engine.QueryMetrics => Unit = _ => ())(
        df: => DataFrame): Unit = {
      // scoped listener capture (graft.engine.Metrics) — the same
      // counters the History Server aggregates on a real cluster
      // full evaluation via the no-op sink: a count() action would let
      // Catalyst skip final sorts — under a 2 GB heap the sort is
      // often exactly where the spill is
      val (outcome, m) = graft.engine.Metrics.measure(spark) {
        try { graft.util.Exec.drain(df); Right(()) }
        catch { case t: Throwable => Left(t) }
      }
      onMetrics(m)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      graft.ops.Llm.invalidateIslandsCache()
      graft.ops.Llm.invalidateClusterLabelCache()
      System.gc()
      val dt = m.wallMs / 1000.0
      outcome match {
        case Right(_) =>
          println(f"== $name%-18s OK    $dt%7.1f s  " +
            f"spill mem=${m.memorySpilledBytes / (1 << 20)}%6d MB  " +
            f"disk=${m.diskSpilledBytes / (1 << 20)}%6d MB  " +
            f"peakTask=${m.peakTaskMemory / (1 << 20)}%5d MB  " +
            f"spread=${m.taskSpread}%.1f")
        case Left(t) =>
          failed = true
          println(f"== $name%-18s FAILED $dt%6.1f s  ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }

    import graft.ops._
    var anySpill = 0L
    val track = (m: graft.engine.QueryMetrics) =>
      anySpill += m.memorySpilledBytes + m.diskSpilledBytes
    probe("ngram dedup", track) { Llm.dedupNgram(spark, dst) }
    probe("substr removal", track) { Llm.substrDedupRemove(spark, dst) }
    probe("dedup clusters", track) { Llm.dedupClusters(spark, dst) }

    println(if (failed) "== RESULT: FAILURES (see above)"
      else "== RESULT: all heavy dedup plans completed under the capped heap")
    if (!failed && anySpill == 0)
      println("== WARNING: zero spill recorded anywhere — the heap was " +
        "never pressured at this factor; the spill-not-OOM claim is " +
        "not established by this run")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
