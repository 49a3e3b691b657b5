package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave places x on even bits, y on odd bits") {
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 1L) // x bit 0 -> z bit 0
    assert(ZOrder.interleave(0L, 1L) == 2L) // y bit 0 -> z bit 1
    assert(ZOrder.interleave(3L, 3L) == 15L) // 0b1111
    assert(ZOrder.interleave(0b101L, 0b011L) == 0b011011L)
    // only the low 31 bits of each input participate; result >= 0
    assert(ZOrder.interleave(0x7FFFFFFFL, 0x7FFFFFFFL) == 0x3FFFFFFFFFFFFFFFL)
    assert(ZOrder.interleave(-1L, -1L) == 0x3FFFFFFFFFFFFFFFL)
  }

  test("codegen and interpreted paths agree with the reference impl") {
    ZOrder.register(spark)
    val df = spark.range(0, 1000).toDF("i")
      .select(col("i") * 7919 % 1024 as "x", col("i") * 104729 % 1024 as "y")
    def check(): Unit = {
      val rows = df.select(col("x"), col("y"), expr("zorder2(x, y)").as("z"))
        .as[(Long, Long, Long)].collect()
      rows.foreach { case (x, y, z) =>
        assert(z == ZOrder.interleave(x, y), s"($x, $y)")
      }
    }
    check() // default: whole-stage codegen (doGenCode path)
    // now ACTUALLY exercise the interpreted eval (nullSafeEval): with
    // whole-stage codegen off and the codegen factory forced to
    // NO_CODEGEN, expression evaluation goes through the interpreter
    val savedWsc = spark.conf.get("spark.sql.codegen.wholeStage")
    val factoryKey = "spark.sql.codegen.factoryMode"
    val savedFactory = spark.conf.getOption(factoryKey)
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set(factoryKey, "NO_CODEGEN")
      check() // interpreted path
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", savedWsc)
      savedFactory match {
        case Some(v) => spark.conf.set(factoryKey, v)
        case None    => spark.conf.unset(factoryKey)
      }
    }
  }

  test("GraftExtensions injects both native functions into a fresh session") {
    val base = spark // force the shared session (and its context) up
    try {
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      // same SparkContext, fresh session state with the extensions
      // applied at build time — the spark.sql.extensions deployment path
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "must be a fresh session, not the shared one")
      val row = s2.sql(
        "SELECT cosine_sim(array(1.0D, 0D), array(1.0D, 0D)) AS c," +
          " zorder2(3L, 1L) AS z").head()
      assert(row.getDouble(0) == 1.0)
      assert(row.getLong(1) == 7L) // x=3 -> bits 0,2; y=1 -> bit 1
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("z-sort clusters both dimensions: adjacent rows are near in x AND y") {
    ZOrder.register(spark)
    // full 32x32 grid, z-sorted; Morton guarantees any K consecutive
    // values span an x- and y-range of O(sqrt(K)), unlike a
    // lexicographic (x, y) sort where a single x value spans ALL of y
    val grid = spark.range(0, 1024).toDF("i")
      .select((col("i") / 32).cast("long").as("x"), (col("i") % 32).as("y"))
      .select(col("x"), col("y"), expr("zorder2(x, y)").as("z"))
      .orderBy("z").as[(Long, Long, Long)].collect()
    grid.sliding(64, 64).foreach { chunk =>
      val xs = chunk.map(_._1)
      val ys = chunk.map(_._2)
      assert(xs.max - xs.min <= 8 && ys.max - ys.min <= 8,
        s"64-row z-run must stay in an 8x8 tile, got ${xs.min}..${xs.max} x ${ys.min}..${ys.max}")
    }
  }
}
