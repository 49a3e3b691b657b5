package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("measure captures input, shuffle, and task counters for a real join") {
    val ((rows, plainShuffle), m) = Metrics.measure(spark) {
      val orders = Tables(spark, sfSmoke, "orders")
      val customer = Tables(spark, sfSmoke, "customer")
      // a NON-broadcast join so both sides genuinely shuffle
      val joined = orders.hint("shuffle_hash")
        .join(customer.hint("shuffle_hash"),
          orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val n = joined.count()
      val (_, inner) = Metrics.measure(spark)(
        Tables(spark, sfSmoke, "orders").count())
      (n, inner.shuffleReadBytes)
    }
    assert(rows > 0)
    assert(m.tasks > 0, "tasks must be attributed to the window")
    assert(m.inputBytes > 0 && m.inputRecords > 0,
      "parquet scan bytes/records must land in inputMetrics")
    assert(m.shuffleReadBytes > 0 && m.shuffleWriteBytes > 0,
      "a shuffle-hash join must record shuffle traffic on both ends")
    assert(m.maxTaskMs >= m.p50TaskMs && m.taskSpread >= 1.0)
    assert(m.wallMs > 0)
    // the shuffled join moves more shuffle bytes than a bare count's
    // single-row partials — the counter discriminates plan shapes
    assert(m.shuffleReadBytes > plainShuffle)
  }

  test("a map-side-only action records no spill at smoke scale") {
    val (n, m) = Metrics.measure(spark) {
      Tables(spark, sfSmoke, "lineitem")
        .filter(col("l_quantity") > 25).count()
    }
    assert(n > 0 && m.tasks > 0)
    assert(!m.spilled,
      s"sf0.001 filter+count must not spill, got ${m.pretty}")
  }

  test("nested measurement windows do not corrupt each other") {
    val ((innerN, innerM), outerM) = Metrics.measure(spark) {
      Metrics.measure(spark)(Seq(1, 2, 3).toDF("x").count())
    }
    assert(innerN == 3L)
    // outer window saw at least the inner window's tasks
    assert(outerM.tasks >= innerM.tasks && innerM.tasks > 0)
  }
}
