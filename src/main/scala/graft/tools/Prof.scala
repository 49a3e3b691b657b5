package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Stage-cost profiler for the heavy LLM-suite plans: times each
  * stage of the MinHash-LSH pipeline (shingle derivation, signature
  * aggregation, band join, exact verify) and the KMeans fit, so a
  * regression in any one stage is attributable instead of hiding in a
  * per-query total. Found the round-2 shingle bug: `element_at(
  * split(text), i)` lambdas re-tokenized the document per element —
  * O(tokens^2)/row, 20x the cost of the joins they fed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Prof"
  */
object Prof {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  /** Drain-actioned stage timer for plans whose expensive expressions
    * a count() would PRUNE (ungrouped/unreferenced aggregates — the
    * Exec.drain rationale). */
  def td(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
    val t0 = System.nanoTime()
    graft.util.Exec.drain(df)
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").count()

    // mirrors Llm's bound-token shingle form (kept in sync by the
    // LlmSpec equality tests rather than shared — this tool must stay
    // free to probe variant shapes against the production one)
    val docs = Tables(spark, dir, "documents")
      .withColumn("t", expr("split(text, ' ')"))
      .select(col("doc_id"), expr(
        """array_distinct(transform(
             arrays_zip(slice(t, 1, greatest(size(t) - 2, 0)),
                        slice(t, 2, greatest(size(t) - 2, 0)),
                        slice(t, 3, greatest(size(t) - 2, 0))),
             p -> concat_ws(' ', p['0'], p['1'], p['2'])))""").as("shingles"))
      .filter(size(col("shingles")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("docs+shingles") { docs.count() }
    val sh = docs.select(col("doc_id"), explode(col("shingles")).as("s"))
    t("shingle rows") { sh.count() }
    val sigs = sh.groupBy(col("doc_id")).agg(
      min(xxhash64(lit(0), col("s"))).as("h0"),
      (1 until 12).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i")): _*)
    // drain, not count(): under count() Catalyst prunes the 12
    // min(xxhash64) aggregate expressions and this stage times an
    // EMPTY aggregate — a hashing regression would hide in the
    // downstream candidates row
    td("signatures")(sigs)
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until 6).map(j =>
        concat_ws(",", col(s"h${2 * j}"), col(s"h${2 * j + 1}"))): _*))
        .as(Seq("band_idx", "band_key")))
    val a = banded.as("a")
    val b = banded.as("b")
    val cands = a
      .join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    t("candidates") { cands.count() }
    val sa = docs.select(col("doc_id").as("d1"), col("shingles").as("sa"))
    val sb = docs.select(col("doc_id").as("d2"), col("shingles").as("sb"))
    val verified = cands
      .join(sa, Seq("d1"))
      .join(sb, Seq("d2"))
      .withColumn("ic", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("ic") * lit(1.0) /
          (size(col("sa")) + size(col("sb")) - col("ic")))
      .filter(col("jaccard") >= 0.5)
    t("verify") { verified.count() }

    val inter = sh.as("x")
      .join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
    t("ngram join rows") { inter.count() }

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
    val li = Tables(spark, dir, "lineitem").select(
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount"))
      .setOutputCol("features_raw")
      .transform(li.repartition(8))
    val scaled = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
      .fit(assembled).transform(assembled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("scale+persist") { scaled.count() }
    val sample = scaled.sample(withReplacement = false, 0.16, 42L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sample count") { sample.count() }
    t("kmeans fit sampled") {
      new KMeans().setK(3).setSeed(42)
        .setFeaturesCol("features").setPredictionCol("c")
        .fit(sample); 0L
    }
    spark.stop()
  }
}
