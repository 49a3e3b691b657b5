package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase

/** Property-based invariants (SURVEY.md §5.2): dedup idempotence,
  * union additivity, clamp bounds, percentile monotonicity, salted-agg
  * equivalence — each over generated inputs through the real Spark
  * operators. */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))

  test("dedup-by-latest is idempotent and keeps one row per key") {
    check("dedup", Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "id")
        val w = Window.partitionBy($"k").orderBy($"t".desc, $"id".desc)
        def dedup(d: org.apache.spark.sql.DataFrame) =
          d.withColumn("rn", row_number().over(w))
            .filter($"rn" === 1).drop("rn")
        val once = dedup(df).collect().toSet
        val twice = dedup(dedup(df)).collect().toSet
        once == twice && once.size == rows.map(_._1).distinct.size
      }
    })
  }

  test("union-all count is additive") {
    check("union", Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      val da = a.toDF("k", "t")
      val db = b.toDF("k", "t")
      da.unionByName(db).count() == a.size.toLong + b.size.toLong
    })
  }

  test("clamp output always within bounds and is idempotent") {
    val doubles = Gen.listOfN(30, Gen.choose(-1e6, 1e6))
    check("clamp", Prop.forAll(doubles) { xs =>
      xs.isEmpty || {
        def clamp(c: org.apache.spark.sql.Column) =
          least(greatest(c, lit(10.0)), lit(100.0))
        val out = xs.toDF("x").select(clamp($"x").as("c"))
        val vals = out.as[Double].collect()
        val again = out.select(clamp($"c")).as[Double].collect()
        vals.forall(v => v >= 10.0 && v <= 100.0) &&
          vals.toSeq == again.toSeq
      }
    })
  }

  test("percentile is monotone in p and bounded by min/max") {
    val doubles = Gen.listOfN(25, Gen.choose(-1e4, 1e4))
    check("percentile", Prop.forAll(doubles) { xs =>
      xs.isEmpty || {
        val df = xs.toDF("x")
        val r = df.agg(
          expr("percentile(x, 0.25)"), expr("percentile(x, 0.5)"),
          expr("percentile(x, 0.99)"), min($"x"), max($"x")).head()
        val (p25, p50, p99) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        p25 <= p50 && p50 <= p99 &&
          r.getDouble(3) <= p25 && p99 <= r.getDouble(4)
      }
    })
  }

  test("salted two-phase aggregation equals plain groupBy") {
    check("salted", Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.zipWithIndex
          .map { case ((k, v), i) => (k, v, i.toLong) }
          .toDF("k", "v", "id")
        val plain = df.groupBy($"k")
          .agg(count(lit(1)).as("c"), sum($"v").as("s"))
          .as[(Long, Long, Long)].collect().toSet
        val salted = df
          .withColumn("salt", pmod($"id", lit(4)))
          .groupBy($"k", $"salt")
          .agg(count(lit(1)).as("pc"), sum($"v").as("ps"))
          .groupBy($"k")
          .agg(sum($"pc").as("c"), sum($"ps").as("s"))
          .as[(Long, Long, Long)].collect().toSet
        plain == salted
      }
    })
  }

  test("de-concentrated global index equals the single-window row_number for arbitrary doubles") {
    // values include duplicates, NaN (sorts greater than everything),
    // and NULL (sorts first under Spark's ASC default) — the exact
    // orderings rangeBucketOf's bucket-0/top-bucket pinning must
    // reproduce for the concatenated per-bucket indexes to be the
    // global order
    val valGen: Gen[Option[Double]] = Gen.frequency(
      (8, Gen.choose(-1e4, 1e4).map(Some(_))),
      (1, Gen.const(Some(Double.NaN))),
      (1, Gen.const(Option.empty[Double])))
    val rows = Gen.listOfN(40, valGen)
    check("global-index", Prop.forAll(rows) { vs =>
      vs.isEmpty || {
        val df = vs.zipWithIndex
          .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
        val got = Windows.withGlobalIndex(df, "v", Seq("id"), "gi")
          .select($"id", $"gi").as[(Long, Long)].collect().toMap
        // reference: the one-task global window the machinery replaces
        val want = df.withColumn("gi",
            row_number().over(Window.orderBy($"v", $"id")) - 1)
          .select($"id", $"gi".cast("long")).as[(Long, Long)]
          .collect().toMap
        got == want
      }
    })
  }

  test("MERGE clause matrix equals a naive per-row reference for arbitrary clauses") {
    import graft.engine.Merge
    // conditions are threshold predicates on one side's value; every
    // generated clause carries BOTH its Column form (fed to the
    // engine) and its Scala form (fed to the reference)
    sealed trait C {
      def clause: Merge.Clause
      def matched: Boolean
    }
    // d: assignment delta; c: optional condition threshold
    case class MU(c: Option[Long], sSide: Boolean, d: Long) extends C {
      val matched = true
      def clause = Merge.MatchedUpdate(
        c.map(t => (if (sSide) col("s.v") else col("t.v")) > t),
        Map("v" -> (col("s.v") + d)))
      def applies(tv: Long, sv: Long) =
        c.forall(t => (if (sSide) sv else tv) > t)
    }
    case class MD(c: Option[Long]) extends C {
      val matched = true
      def clause = Merge.MatchedDelete(c.map(t => col("s.v") > t))
      def applies(sv: Long) = c.forall(sv > _)
    }
    case class NI(c: Option[Long], d: Long) extends C {
      val matched = false
      def clause = Merge.NotMatchedInsert(c.map(t => col("s.v") > t),
        Map("k" -> col("s.k"), "v" -> (col("s.v") + d)))
      def applies(sv: Long) = c.forall(sv > _)
    }
    case class BU(c: Option[Long], d: Long) extends C {
      val matched = false
      def clause = Merge.NotMatchedBySourceUpdate(
        c.map(t => col("t.v") > t), Map("v" -> (col("t.v") + d)))
      def applies(tv: Long) = c.forall(tv > _)
    }
    case class BD(c: Option[Long]) extends C {
      val matched = false
      def clause = Merge.NotMatchedBySourceDelete(c.map(t => col("t.v") > t))
      def applies(tv: Long) = c.forall(tv > _)
    }
    val condGen = Gen.option(Gen.choose(-50L, 50L))
    val clauseGen: Gen[C] = Gen.oneOf(
      Gen.zip(condGen, Gen.oneOf(true, false), Gen.choose(-5L, 5L))
        .map { case (c, s, d) => MU(c, s, d) },
      condGen.map(MD(_)),
      Gen.zip(condGen, Gen.choose(-5L, 5L)).map { case (c, d) => NI(c, d) },
      Gen.zip(condGen, Gen.choose(-5L, 5L)).map { case (c, d) => BU(c, d) },
      condGen.map(BD(_)))
    val clausesGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, clauseGen))
    // unique source keys (duplicate source keys are the ambiguity
    // error, specced separately in MergeSpec); target keys may repeat
    val tgtGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(-60L, 60L)))
    val srcGen = Gen.listOfN(8,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(-60L, 60L)))
      .map(_.distinctBy(_._1))
    check("merge-matrix", Prop.forAll(tgtGen, srcGen, clausesGen) {
      (tgt, src, cs) =>
        val target = tgt.toDF("k", "v")
        val source = src.toDF("k", "v")
        val got = Merge.merge(target, source, Seq("k"), cs.map(_.clause))
          .as[(Long, Long)].collect().toSeq.sorted
        // naive per-row reference: first applicable clause wins, an
        // unclaimed row carries through, an unclaimed source row drops
        val byKey = src.toMap
        val fromTarget = tgt.flatMap { case (k, tv) =>
          byKey.get(k) match {
            case Some(sv) =>
              cs.filter(_.matched).collectFirst {
                case m: MU if m.applies(tv, sv) => Seq((k, sv + m.d))
                case m: MD if m.applies(sv) => Seq.empty
              }.getOrElse(Seq((k, tv)))
            case None =>
              cs.collectFirst {
                case b: BU if b.applies(tv) => Seq((k, tv + b.d))
                case b: BD if b.applies(tv) => Seq.empty
              }.getOrElse(Seq((k, tv)))
          }
        }
        val tgtKeys = tgt.map(_._1).toSet
        val fromSource = src.filterNot(s => tgtKeys(s._1)).flatMap {
          case (k, sv) =>
            cs.collectFirst {
              case i: NI if i.applies(sv) => Seq((k, sv + i.d))
            }.getOrElse(Seq.empty)
        }
        val want = (fromTarget ++ fromSource).sorted
        got == want
    })
  }

  test("bloom probe admits every member for arbitrary insert sets (no false negatives)") {
    val setGen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
      .map(_.distinct)
    try check("bloom-no-false-negatives", Prop.forAll(setGen) { vals =>
      val f = org.apache.spark.util.sketch.BloomFilter
        .create(math.max(vals.size.toLong, 1L), 0.01)
      vals.foreach(f.putLong)
      // through the full Spark expression path (serialize, codegen,
      // probe), every inserted value must come back
      val admitted = vals.toDF("h")
        .filter(graft.functions.BloomMightContain(spark, $"h", f))
        .count()
      admitted == vals.size.toLong
    })
    // each trial registered a content-keyed temp function in the
    // SHARED session — drop them so the suite doesn't accrete ~100
    // dead sketch-byte closures (the leak unregisterAll exists for)
    finally graft.functions.BloomMightContain.unregisterAll(spark)
  }
}
