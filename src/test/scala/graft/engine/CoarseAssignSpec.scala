package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The two-level pruned assign (CoarseAssign) against the exact
  * all-centroid rule on a shared synthetic fixture ABOVE the pruning
  * threshold — the unit-scale face of the QuantizerProbe `assign`
  * evidence. Production small-k paths (model.transform, the exact
  * crossJoin in AnnIndex.assign) are deliberately untouched by the
  * pruned plan; this spec forces the pruned plan directly. */
class CoarseAssignSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16

  /** k=220 deterministic pseudo-random UNIT centroids (above
    * minK=192) plus n vectors drawn per-centroid with small
    * deterministic noise — production-shaped geometry: the served
    * centroids are means of unit vectors, so they sit on/near the
    * unit sphere, and the assign scores unit vectors against them. */
  private def fixture(n: Int) = {
    val rnd = new scala.util.Random(1234L)
    def unit(a: Array[Double]) = {
      val nrm = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / nrm)
    }
    val cents = Array.tabulate(220) { i =>
      (i, unit(Array.fill(dim)(rnd.nextGaussian())))
    }
    val vecs = (0 until n).map { v =>
      val c = cents(rnd.nextInt(cents.length))._2
      val e = c.map(_ + 0.1 * rnd.nextGaussian())
      (v.toLong, e.toSeq)
    }
    val vectors = vecs.toDF("vec_id", "e")
      .withColumn("unit", expr(graft.ops.Llm.unitNormE))
    (cents, vectors)
  }

  test("pruned assigns every vector, deterministically") {
    val (cents, vectors) = fixture(600)
    assert(cents.length >= CoarseAssign.minK)
    val a = CoarseAssign.pruned(vectors, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == 600, "every input vector must come back assigned")
    val b = CoarseAssign.pruned(vectors, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "pruned assignment must be deterministic across runs")
  }

  test("pruned agrees with the exact rule on nearly every vector, " +
      "and disagreements are boundary-bounded") {
    val (cents, vectors) = fixture(800)
    val exact = CoarseAssign.exactOn(vectors, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pruned = CoarseAssign.pruned(vectors, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pruned.keySet == exact.keySet)
    val agree = exact.count { case (id, c) => pruned(id) == c }
    assert(agree >= (0.97 * exact.size).toInt,
      s"agreement $agree/${exact.size} below the 97% soft-membership bound")
    // where the argmin was pruned, the chosen cell must still be a
    // NEARBY centroid — rank-bounded, which is scale-free where a
    // distance RATIO is not (tight clusters make the true min
    // distance a tiny denominator). A boundary miss falls to one of
    // the vector's next-nearest centroids; a structural break (wrong
    // column, wrong membership, broken d2) lands at an arbitrary
    // rank — mean ~k/2 = 110 on this fixture
    val units = vectors.select("vec_id", "unit").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ranks = for ((id, _) <- exact.toSeq if pruned(id) != exact(id)) yield {
      val byDist = cents.map { case (cell, ce) => (d2(units(id), ce), cell) }
        .sorted.map(_._2)
      byDist.indexOf(pruned(id))
    }
    if (ranks.nonEmpty) {
      val mean = ranks.sum.toDouble / ranks.size
      assert(mean <= 12.0, s"mean pruned-miss centroid rank $mean over " +
        s"${ranks.size} disagreements (ranks: ${ranks.sorted.mkString(",")})")
      assert(ranks.max <= 60,
        s"worst pruned miss landed at centroid rank ${ranks.max}")
    }
  }

  test("degenerate rows (zero norm, NaN/Inf component, null element) " +
      "degrade to a served cell — never -1, never a throw") {
    val (cents, _) = fixture(0)
    val served = cents.map(_._1).toSet
    val good = Seq(
      (0L, Array.fill(dim)(0.5).toSeq),
      (1L, Seq.fill(dim)(0.0)), // zero norm: kernel scores the raw zeros
      (4L, Double.PositiveInfinity +: Seq.fill(dim - 1)(1.0)))
    val boxed: Seq[(Long, Seq[java.lang.Double])] = Seq(
      (2L, java.lang.Double.valueOf(Double.NaN) +:
        Seq.fill(dim - 1)(java.lang.Double.valueOf(1.0))),
      (3L, (null: java.lang.Double) +:
        Seq.fill(dim - 1)(java.lang.Double.valueOf(1.0))))
    val df = good.toDF("vec_id", "e")
      .unionByName(boxed.toDF("vec_id", "e"))
    val run = () => CoarseAssign.pruned(df, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = run()
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L),
      "every row, degenerate or not, must come back assigned")
    for ((id, c) <- out)
      assert(served(c), s"vec $id got unserved cell $c")
    assert(run() == out, "degenerate routing must be deterministic")
  }

  test("exact rule matches a driver-side argmin oracle (tie rule " +
      "lowest cell id)") {
    val (cents, vectors) = fixture(200)
    val exact = CoarseAssign.exactOn(vectors, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val units = vectors.select("vec_id", "unit").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for ((id, u) <- units) {
      val want = cents.map { case (cell, ce) => (d2(u, ce), cell) }
        .minBy(identity)._2
      assert(exact(id) == want, s"vec $id")
    }
  }
}
