package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Planted-ground-truth recall gates for every approximate operator,
  * measured against its EXACT in-engine counterpart — the surface the
  * rows-only correctness entries cannot see. Each gate is a numeric
  * bound, not a smoke check: an approximate path that silently
  * degrades to noise fails here even though its row counts look fine.
  *
  * Two fixture families:
  *  - the DOCUMENT gates (MinHash, SimHash) run on the real testdata
  *    corpora, tri-scale (sf0.001/0.01/0.1), whose planted text
  *    near-dups give a nonempty jaccard ground truth;
  *  - the EMBEDDING gates run on PLANTED synthetic tables at three
  *    sizes — probed against DuckDB, the testdata embeddings contain
  *    ZERO pairs above cosine 0.8 at any scale, so a meaningful
  *    strong-neighbor recall can only be measured on vectors we
  *    plant: each anchor gets near-copies at cosine ~0.999, the
  *    query anchor gets more copies than k so the ENTIRE exact
  *    top-10 is planted signal, and eval-id anchors give the
  *    semantic-decontamination path true leaks to find.
  */
class ApproxRecallSpec extends SparkTestBase {
  import spark.implicits._

  private val sfMid = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet

  private def recall(truth: Set[(Long, Long)], got: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 1.0 else truth.count(got.contains).toDouble / truth.size

  /** Synthetic embeddings table with planted near-dup structure,
    * written as `<tmp>/embeddings.parquet` so every Llm op reads it
    * through the same catalog seam as the real fixtures. Layout:
    * unit-normalized 64-dim gaussians (cross-cosine ~N(0, 1/8), so
    * organic pairs never cross 0.4); ids 1..12 are noisy copies of
    * anchor 0 (cosine ~0.999 — MORE copies than k, so the exact
    * top-10 is pure planted signal); every 20th id from 20 up is an
    * anchor whose next two ids are its copies (multiples of 20 are
    * eval ids mod 10, giving decontamination true train->eval leaks).
    * Returns (dir, planted dup pair set, planted dropped-id set). */
  private def plantEmbeddings(n: Int): (String, Set[(Long, Long)], Set[Long]) = {
    val dims = 64
    val rnd = new scala.util.Random(42 + n)
    def unit(v: Array[Float]): Array[Float] = {
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / norm)
    }
    def gauss(): Array[Float] =
      unit(Array.fill(dims)(rnd.nextGaussian().toFloat))
    def noisy(a: Array[Float]): Array[Float] =
      unit(a.zip(Array.fill(dims)(rnd.nextGaussian().toFloat))
        .map { case (x, e) => x + 0.02f * e })
    val anchors = scala.collection.mutable.Map[Long, Array[Float]]()
    val copies = scala.collection.mutable.Map[Long, Long]() // copy -> anchor
    val rows = (0L until n.toLong).map { id =>
      val v =
        if (id == 0L) { val a = gauss(); anchors(id) = a; a }
        else if (id <= 12L) { copies(id) = 0L; noisy(anchors(0L)) }
        else if (id % 20 == 0) { val a = gauss(); anchors(id) = a; a }
        else if (id % 20 <= 2 && anchors.contains(id - id % 20)) {
          copies(id) = id - id % 20; noisy(anchors(id - id % 20))
        } else gauss()
      (id, v.toSeq, (id % 16).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory(s"graft_plant_$n").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val members = (anchors.keys ++ copies.keys).toSeq
      .groupBy(id => copies.getOrElse(id, id))
    val pairs = members.values.flatMap { grp =>
      val s = grp.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSet
    val dropped = members.values.flatMap(_.sorted.drop(1)).toSet
    (dir, pairs, dropped)
  }

  private def releaseCaches(): Unit = {
    Llm.invalidateCellCache()
    Llm.invalidatePqCache()
    Llm.invalidateAnnIndexCache()
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  // ------------------------------------------------------------- MinHash

  test("recall gate: MLlib MinHashLSH vs the exact-verified pair set") {
    for (sf <- Seq(sfSmoke, sfMid, sfBig)) {
      // ground truth: the exact-verified native path (== exhaustive
      // ngram join, asserted elsewhere); gate on pairs comfortably
      // above the LSH join's 0.5 distance boundary where banding
      // theory promises near-total recall
      val truth = pairSet(Llm.dedupMinhashNative(spark, sf)
        .filter(col("jaccard") >= 0.7))
      val got = pairSet(Llm.dedupMinhash(spark, sf))
      assert(truth.nonEmpty, s"$sf plants near-dups above 0.7")
      val r = recall(truth, got)
      assert(r >= 0.95,
        s"$sf: MLlib MinHash recall $r on ${truth.size} planted pairs")
      releaseCaches()
    }
  }

  // ------------------------------------------------------------- SimHash

  test("recall gate: SimHash banded pairs vs exact near-dups") {
    for (sf <- Seq(sfSmoke, sfMid, sfBig)) {
      // planted near-dups share almost all tokens -> tiny Hamming
      // distance; the 4-band OR-amplified candidate join must surface
      // them (the single-band form measured 0.43 here). The gate
      // decomposes by signature distance: at hamming<=3, four bands
      // and at most three flipped bits force >=1 untouched band —
      // recall there is 1.0 BY PIGEONHOLE, so anything less is a
      // banding bug, not noise. Past that the catch probability
      // decays (P(all 4 bands touched) is already ~0.38 at hamming
      // 6), which is SimHash's documented soft tail vs MinHash —
      // measured 0.887 overall at sf0.1, gated at 0.85.
      val truth = pairSet(Llm.dedupNgram(spark, sf)
        .filter(col("jaccard") >= 0.8))
      val sigs = Llm.dedupSimhash(spark, sf)
        .select(col("doc_id"), col("simhash"))
        .as[(Long, Long)].collect().toMap
      val got = pairSet(Llm.simhashPairs(spark, sf, maxHamming = 10))
      assert(truth.nonEmpty, s"$sf plants near-dups above 0.8")
      def ham(p: (Long, Long)): Int =
        java.lang.Long.bitCount(sigs(p._1) ^ sigs(p._2))
      val close = truth.filter(ham(_) <= 3)
      // the pigeonhole gate is vacuous on an empty region (recall(∅)
      // is 1.0 by definition): a signature bug that scatters every
      // planted pair past hamming 3 must fail HERE, not silently
      // un-exercise the gate below
      assert(close.nonEmpty,
        s"$sf: no planted pair within hamming 3 — signatures scattered?")
      val rAll = recall(truth, got)
      val rClose = recall(close, got)
      assert(rAll >= 0.85,
        s"$sf: SimHash recall $rAll on ${truth.size} planted pairs")
      assert(rClose == 1.0,
        s"$sf: pigeonhole region must be total, got $rClose on ${close.size}")
      releaseCaches()
    }
  }

  // ------------------------------------------------------------- ANN top-k

  test("recall gate: annLsh and annIvf recover the planted exact top-10") {
    for (n <- Seq(200, 800, 2400)) {
      val (dir, _, _) = plantEmbeddings(n)
      val exact = Llm.cosineTopk(spark, dir).collect().map(_.getLong(0)).toSet
      // the 12 planted copies of anchor 0 own the whole top-10: the
      // gate measures recall of real neighbors, not noise ranking
      assert(exact.subsetOf((1L to 12L).toSet),
        s"n=$n: exact top-10 must be planted signal, got $exact")
      val lsh = Llm.annLsh(spark, dir).collect().map(_.getLong(0)).toSet
      val ivf = Llm.annIvf(spark, dir).collect().map(_.getLong(0)).toSet
      val rLsh = (exact & lsh).size
      val rIvf = (exact & ivf).size
      assert(rLsh >= 9, s"n=$n: annLsh recall $rLsh/10 on planted neighbors")
      assert(rIvf >= 9, s"n=$n: annIvf recall $rIvf/10 on planted neighbors")
      // the PERSISTED path (q_llm_ann_index): same gate served from
      // the committed snapshot instead of the per-session fit
      val served = Llm.queries("q_llm_ann_index")(spark, dir)
        .collect().map(_.getLong(0)).toSet
      val rIdx = (exact & served).size
      assert(rIdx >= 9,
        s"n=$n: persisted-index recall $rIdx/10 on planted neighbors")
      // the COMPRESSED path (q_llm_ann_pq): ADC over byte codes +
      // exact re-rank of the shortlist must keep the same gate —
      // quantization error is allowed to cost rank resolution inside
      // the shortlist, NOT recall of the planted neighbors
      val pq = Llm.annIvfPq(spark, dir).collect().map(_.getLong(0)).toSet
      val rPq = (exact & pq).size
      assert(rPq >= 9, s"n=$n: annIvfPq recall $rPq/10 on planted neighbors")
      // the PERSISTED COMPRESSED path (q_llm_ann_pq_index): committed
      // codebook + codes tables, IVFADC serve — same gate again
      val pqIdx = Llm.queries("q_llm_ann_pq_index")(spark, dir)
        .collect().map(_.getLong(0)).toSet
      val rPqIdx = (exact & pqIdx).size
      assert(rPqIdx >= 9,
        s"n=$n: persisted IVFADC recall $rPqIdx/10 on planted neighbors")
      // batch kNN JOIN: queries 0-4 are anchor-family, their planted
      // neighbors (copies 5-12) all live in the probed cells — the
      // IVF-probed join must recover every planted neighbor the exact
      // join ranks, and >= 8/10 overall (the noise tail may sit in
      // unprobed cells, which is the documented probe tradeoff)
      def byQ(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val planted = (5L to 12L).toSet
      val exJ = byQ(Llm.queries("q_llm_knn_join")(spark, dir).collect())
      val ivJ = byQ(Llm.queries("q_llm_knn_join_ivf")(spark, dir).collect())
      assert(exJ.keySet == (0L to 4L).toSet, s"n=$n: 5 queries expected")
      exJ.foreach { case (qid, ex10) =>
        val got = ivJ.getOrElse(qid, Set.empty)
        assert((got & planted) == (ex10 & planted),
          s"n=$n qid=$qid: probed join lost a planted neighbor " +
            s"(exact ${ex10 & planted}, got ${got & planted})")
        assert((ex10 & got).size >= 8,
          s"n=$n qid=$qid: knn-join recall ${(ex10 & got).size}/10")
      }
      releaseCaches()
      graft.util.Fs.deleteRecursively(dir)
    }
  }

  // ------------------------------------------------------------- SemDeDup

  test("recall gate: SemDeDup cell-bounded drops vs planted ground truth") {
    for (n <- Seq(200, 800, 2400)) {
      val (dir, _, plantedDrops) = plantEmbeddings(n)
      val got = Llm.semDedupDropped(spark, dir).as[Long].collect().toSet
      // precision 1 by construction: a celled drop implies a real
      // >=0.8 pair, and only planted copies sit that close
      assert(got.subsetOf(plantedDrops),
        s"n=$n: dropped ${got -- plantedDrops} beyond the planted set")
      val r = plantedDrops.count(got.contains).toDouble / plantedDrops.size
      assert(r >= 0.9,
        s"n=$n: SemDeDup drop recall $r on ${plantedDrops.size} planted dups")
      releaseCaches()
      graft.util.Fs.deleteRecursively(dir)
    }
  }

  // ------------------------------------------- embed_neardup dispatch

  test("embed_neardup: default dispatch is the exact path on small corpora") {
    val dispatch = Llm.embedNeardup(spark, sfSmoke)
    val exact = Llm.embedNeardupExact(spark, sfSmoke)
    // assert the REGIME, not just the output: on this fixture the LSH
    // path emits exactly re-scored rows too, so output equality alone
    // could pass an inverted bound comparison by coincidence.
    // sameResult canonicalizes expression ids — true iff the dispatch
    // returned the exact PLAN
    assert(dispatch.queryExecution.optimizedPlan
        .sameResult(exact.queryExecution.optimizedPlan),
      "default dispatch below the bound must BE the exact plan")
    assert(!Llm.embedNeardupDispatch(spark, sfSmoke, 0L).queryExecution
        .optimizedPlan.sameResult(exact.queryExecution.optimizedPlan),
      "bound 0 must route to a structurally different (LSH) plan")
    val viaDispatch = dispatch.collect().toSeq
    assert(viaDispatch == exact.collect().toSeq)
    assert(viaDispatch.nonEmpty)
  }

  test("embed_neardup: past the bound the LSH path engages, subset + recall") {
    for (n <- Seq(200, 800, 2400)) {
      val (dir, plantedPairs, _) = plantEmbeddings(n)
      val exactRows = Llm.embedNeardupExact(spark, dir)
        .select(col("d1"), col("d2"), col("cosine"))
        .as[(Long, Long, Double)].collect()
        .map { case (d1, d2, c) => (d1, d2) -> c }.toMap
      // every planted pair is in the exact result (sanity on the plant)
      assert(plantedPairs.forall(exactRows.contains),
        s"n=$n: exact path must see every planted pair")
      // bound 0 forces the big-n path on the small fixture
      val lsh = Llm.embedNeardupDispatch(spark, dir, 0L)
        .select(col("d1"), col("d2"), col("cosine"))
        .as[(Long, Long, Double)].collect()
      // zero false positives, identical scores: every emitted row is
      // exactly re-scored, so it must appear verbatim in the exact set
      lsh.foreach { case (d1, d2, c) =>
        assert(exactRows.get((d1, d2)).contains(c),
          s"n=$n: LSH emitted ($d1,$d2,$c) not in the exact result")
      }
      val got = lsh.map { case (d1, d2, _) => (d1, d2) }.toSet
      val r = recall(plantedPairs, got)
      assert(r >= 0.95,
        s"n=$n: LSH neardup recall $r on ${plantedPairs.size} planted pairs")
      releaseCaches()
      graft.util.Fs.deleteRecursively(dir)
    }
  }

  // -------------------------------------- decontam_semantic dispatch

  test("decontam_semantic: default dispatch is the exact path on small evals") {
    val dispatch = Llm.decontamSemantic(spark, sfSmoke)
    val exact = Llm.decontamSemanticExact(spark, sfSmoke)
    // regime assertion (see the embed_neardup twin): dispatch below
    // the bound must return the exact PLAN, bound 0 a different one
    assert(dispatch.queryExecution.optimizedPlan
        .sameResult(exact.queryExecution.optimizedPlan),
      "default dispatch below the bound must BE the exact plan")
    assert(!Llm.decontamSemanticDispatch(spark, sfSmoke, 0L).queryExecution
        .optimizedPlan.sameResult(exact.queryExecution.optimizedPlan),
      "bound 0 must route to a structurally different (IVF) plan")
    val viaDispatch = dispatch.collect().toSeq
    assert(viaDispatch == exact.collect().toSeq)
    assert(viaDispatch.nonEmpty)
  }

  test("decontam_semantic: past the bound the IVF probe path engages") {
    for (n <- Seq(200, 800, 2400)) {
      val (dir, _, _) = plantEmbeddings(n)
      val exact = Llm.decontamSemanticExact(spark, dir)
        .select(col("vec_id"), col("max_sim"), col("contaminated"))
        .as[(Long, Double, Boolean)].collect()
      val exactMax = exact.map(r => r._1 -> r._2).toMap
      val exactBad = exact.filter(_._3).map(_._1).toSet
      // the eval-id anchors' planted train copies are true leaks
      assert(exactBad.nonEmpty, s"n=$n plants semantic leaks")
      // bound 0 forces the probe path on the small fixture
      val ivf = Llm.decontamSemanticDispatch(spark, dir, 0L)
        .select(col("vec_id"), col("max_sim"), col("contaminated"))
        .collect()
      assert(ivf.length == exact.length, "one row per train vector")
      var flagged = Set.empty[Long]
      ivf.foreach { r =>
        val id = r.getLong(0)
        if (!r.isNullAt(1)) {
          // probed max is a true cosine vs a real eval vector: it can
          // only UNDERSHOOT the exhaustive max
          assert(r.getDouble(1) <= exactMax(id) + 1e-9,
            s"n=$n: probe max ${r.getDouble(1)} exceeds exact ${exactMax(id)}")
        }
        if (r.getBoolean(2)) flagged += id
      }
      // precision 1: a probed flag is a real >=0.5 eval neighbor
      assert(flagged.subsetOf(exactBad), s"n=$n: probe flags must be a subset")
      val r = exactBad.count(flagged.contains).toDouble / exactBad.size
      assert(r >= 0.95,
        s"n=$n: probe decontam recall $r on ${exactBad.size} leaks")
      releaseCaches()
      graft.util.Fs.deleteRecursively(dir)
    }
  }

  // ------------------------- forced-path oracle witnesses (driver-visible)

  test("forced-scale witness finds exactly the 20 planted identical pairs") {
    val rows = Llm.embedNeardupForcedScale(spark, sfSmoke)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.size == 20, s"one pair per planted copy: $rows")
    rows.foreach { case (d1, d2, c) =>
      assert(d2 == d1 + 1000000L && d1 < 20 && c == 1.0,
        s"witness pair must be (id, id+1e6, 1.0): ($d1,$d2,$c)")
    }
  }

  test("forced-IVF witness flags exactly the planted contaminated ids") {
    val rows = Llm.decontamSemanticForcedIvf(spark, sfSmoke)
      .as[(Long, Double, Boolean)].collect().toSeq
    // EXACTLY the planted population — nonEmpty+forall alone is the
    // subset direction only, and a probe-rule recall collapse that
    // finds one planted id still satisfies it
    val plantedIds = graft.engine.Tables(spark, sfSmoke, "embeddings")
      .filter(col("vec_id") % 100 === 1)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(plantedIds.nonEmpty, "fixture must carry %100==1 train ids")
    assert(rows.map(_._1).toSet == plantedIds,
      s"witness must flag every planted id: got ${rows.size} of " +
        s"${plantedIds.size}")
    assert(rows.forall(r => r._2 == 1.0 && r._3),
      s"planted copies must score 1.0 contaminated: $rows")
  }
}
