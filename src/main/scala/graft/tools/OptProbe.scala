package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-14 optimization probe: isolated repeated timings (noop-sink
  * drained, bench-identical session geometry) plus formatted-plan
  * capture for named SparkEntry queries — the measure-first harness
  * behind every change in OPTIMIZATION_r14.md. Reports every rep so a
  * host-contention outlier is visible instead of silently averaged.
  *
  * Usage: runMain graft.tools.OptProbe <sfDir> <reps> <planDir|-> <query...>
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val planDir = if (args.length > 2) args(2) else "-"
    val names = if (args.length > 3) args.drop(3).toSeq
                else Seq("q_agg_percentile")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-opt-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (planDir != "-") {
        val df = fn(spark, dir)
        // queryExecution.explainString is the same text explain() prints
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(planDir, s"$n.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      }
      var lastTasks = 0
      var lastShufMb = 0L
      val ts = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"optprobe:$n")
        val (_, m) = graft.engine.Metrics.measure(spark) {
          graft.util.Exec.drain(fn(spark, dir))
        }
        lastTasks = m.tasks
        lastShufMb = m.shuffleWriteBytes / 1048576
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        m.wallMs / 1e3
      }
      println(f"OPT $n%-34s ${ts.map(t => f"$t%6.2f").mkString(" ")}  " +
        f"min=${ts.min}%6.2f tasks=$lastTasks shufMB=$lastShufMb")
    }
    spark.stop()
  }
}
