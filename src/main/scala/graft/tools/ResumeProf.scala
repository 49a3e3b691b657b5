package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Llm

/** Attribution probe for the shard-resume cost model: the x10
  * proportionality rows read warm 2.57 s / @50% 2.31 s / @90% 1.71 s —
  * nowhere near the 1 : 0.5 : 0.1 a "resume cost tracks the remaining
  * fraction" claim predicts. This probe decomposes one resume read
  * into the candidate fixed costs so the fix (or the accepted-cost
  * note) targets the real term:
  *
  *   a. file-index build: VersionedTable.read + filter to ONE shard
  *      (planning lists every partition directory; data ~1/N)
  *   b. direct-path read of the same single shard directory (no
  *      whole-table listing)
  *   c. resume at a cursor, unsorted (prune + scan, no sort exchange)
  *   d. resume at a cursor, sorted (the dataloader contract)
  *
  * Usage: runMain graft.tools.ResumeProf [factor]
  */
object ResumeProf {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dst = Files.createTempDirectory(s"graft_resumeprof_x$factor").toString
    println(s"== inflating sf0.1 x$factor -> $dst")
    Inflate(spark, "/root/testdata/sf0.1", dst, factor)
    val table = Llm.shardWrittenTable(spark, dst)
    val maxShard = graft.engine.VersionedTable.read(spark, table)
      .agg(max(col("shard").cast("long"))).head().getLong(0)
    println(s"== shard table: $table, maxShard=$maxShard")

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"== $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sharedState.cacheManager.clearCache()
    }

    for (round <- 1 to 2) {
      println(s"-- round $round")
      time("read+filter one shard (listing)") {
        graft.util.Exec.drain(
          graft.engine.VersionedTable.read(spark, table)
            .filter(col("shard") === lit(maxShard).cast("int")))
      }
      time("direct-path read one shard") {
        graft.util.Exec.drain(
          spark.read.parquet(s"$table/v0/shard=$maxShard"))
      }
      time("resume @90% unsorted") {
        graft.util.Exec.drain(
          Llm.shardResume(spark, table, maxShard * 9 / 10, 0,
            ordered = false))
      }
      time("resume @90% sorted") {
        graft.util.Exec.drain(
          Llm.shardResume(spark, table, maxShard * 9 / 10, 0))
      }
      time("resume @50% unsorted") {
        graft.util.Exec.drain(
          Llm.shardResume(spark, table, maxShard / 2, 0,
            ordered = false))
      }
      time("resume @50% sorted") {
        graft.util.Exec.drain(
          Llm.shardResume(spark, table, maxShard / 2, 0))
      }
      time("resume @0% unsorted") {
        graft.util.Exec.drain(
          Llm.shardResume(spark, table, 0L, 0, ordered = false))
      }
      time("resume @0% sorted") {
        graft.util.Exec.drain(Llm.shardResume(spark, table, 0L, 0))
      }
    }
    // release the inflated corpus and the memoized shard table — a
    // probe run must not leave ~factor x sf0.1 of parquet under /tmp
    Llm.invalidateShardTableCache()
    graft.util.Fs.deleteRecursively(dst)
    spark.stop()
  }
}
