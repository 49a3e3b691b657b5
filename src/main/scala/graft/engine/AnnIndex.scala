package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, versioned ANN index — similarity search as a SERVABLE
  * ARTIFACT instead of a per-session computation.
  *
  * `annIvf` (graft.ops.Llm) fits its IVF quantizer per session; a
  * 100 TB similarity-serving deployment instead commits the index —
  * (centroids, cell assignments) — as [[VersionedTable]]s, serves
  * probes from the READ path (no fit anywhere near a query), and
  * refreshes incrementally as new vectors land. Layout under `dir`:
  *
  *   dir/centroids   cell INT, ce ARRAY<DOUBLE>      (k ~ sqrt(n) rows)
  *   dir/cells       vec_id LONG, e ARRAY<DOUBLE>, cell INT
  *
  * The assignments snapshot is committed clustered+sorted by `cell`,
  * so a probe's `cell IN (...)` predicate prunes row groups via
  * parquet min/max stats — the single-dir stand-in for the
  * partition-pruned layout (`partitionBy(cell)`) a multi-TB index
  * would use. Centroids change only on [[build]] (a rebuild); a
  * [[refresh]] assigns new vectors to the EXISTING centroids and
  * merges them into the cells table through the race-safe
  * [[Merge.mergeVersioned]] — the standard IVF ingest motion (accept
  * quantizer drift between nightly/weekly rebuilds, never refit on
  * the query or ingest path).
  *
  * Assignment uses MLlib KMeans' own rule — argmin squared euclidean
  * distance, first index wins ties — expressed as codegen'd column
  * arithmetic over the broadcast centroid table, so a vector
  * re-ingested by refresh lands in exactly the cell `build`'s
  * `model.transform` gave it. Probing mirrors `annIvf`: the query's
  * own cell plus the nprobe-1 next centroids by centroid cosine.
  */
object AnnIndex {

  def centroidsDir(dir: String) = s"$dir/centroids"
  def cellsDir(dir: String) = s"$dir/cells"

  /** Every cells commit records WHICH centroids version assigned its
    * cell ids (sidecar `_CENTROIDS_V<cellsVersion>` in the cells
    * dir), so a time-traveled query resolves a CONSISTENT
    * (centroids, cells) pair. Without it a pinned query after a
    * rebuild ranks the NEW quantizer's centroids but scans the OLD
    * quantizer's cell ids — degraded-to-garbage probes, exactly on
    * the path the rebuild-window scaladoc recommends as the
    * mitigation. */
  private def recordCentroidVersion(spark: SparkSession, dir: String,
      cellsVersion: Long, centroidsVersion: Long): Unit =
    VersionedTable.atomicWrite(spark, cellsDir(dir),
      s"_CENTROIDS_V$cellsVersion", centroidsVersion.toString)

  private[graft] def centroidVersionFor(spark: SparkSession, dir: String,
      cellsVersion: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(cellsDir(dir),
      s"_CENTROIDS_V$cellsVersion")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Fit the IVF quantizer on `embRaw` (vec_id, e) and commit the
    * index. Returns the committed cells version.
    *
    * Rebuild visibility window: centroids commit BEFORE cells, so a
    * probe landing between the two commits ranks against the new
    * centroids while scanning the previous quantizer's cell ids —
    * degraded recall for that instant, never an error, and the next
    * cells commit closes it. A deployment that cannot tolerate the
    * window serves probes from PINNED versions (query's `version`
    * arg — which resolves the MATCHING centroids snapshot via the
    * per-version sidecar) and flips the pin after both commits land.
    *
    * `partitionedLayout = true` declares `partitionBy(cell)` as the
    * cells table's layout (VersionedTable `_PART_COLS`): the multi-TB
    * serving shape where a probe's `cell IN (...)` prunes whole
    * partition directories at planning time, and every later
    * refresh/remove commit preserves it. The default single-dir
    * layout (clustered + sorted by cell) still prunes row groups via
    * parquet min/max stats — right for indexes small enough that
    * per-cell directories would mean tiny files. */
  def build(spark: SparkSession, embRaw: DataFrame, dir: String,
      partitionedLayout: Boolean = false): Long = {
    val (model, cells) = graft.ops.Llm.fitIvfCellsOn(spark, embRaw)
    import spark.implicits._
    val centDf = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "ce")
    val centV = VersionedTable.commit(centDf, centroidsDir(dir))
    if (partitionedLayout)
      VersionedTable.setPartitionColumns(spark, cellsDir(dir), Seq("cell"))
    // cluster + sort by cell: row-group stats then prune probe scans
    // (partitioned layout: one file per cell directory instead).
    // cells is an eager local checkpoint — its blocks free with the
    // frame, no unpersist needed
    val cellsV = VersionedTable.commit(
      cells.select(col("vec_id"), col("e"), col("cell"))
        .repartition(col("cell")).sortWithinPartitions(col("cell")),
      cellsDir(dir))
    recordCentroidVersion(spark, dir, cellsV, centV)
    cellsV
  }

  /** MLlib's assignment rule over a broadcast centroid frame:
    * argmin ||unit(e) - c||^2 = argmin (||c||^2 - 2 u.c), first cell
    * index wins ties. One broadcast join + a max_by aggregation —
    * map-side, no corpus shuffle beyond the per-vector k-row fanout. */
  private def assign(newVectors: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = newVectors
      .withColumn("unit", expr(graft.ops.Llm.unitNormE))
      .crossJoin(broadcast(centroids))
      .withColumn("d2",
        expr("aggregate(zip_with(unit, ce, (u, c) -> (u - c) * (u - c))," +
          " 0D, (acc, v) -> acc + v)"))
    // min_by with a composite (d2, cell) struct: smallest distance,
    // then smallest cell id — MLlib findClosest's first-wins tie rule
    scored.groupBy(col("vec_id"))
      .agg(
        first(col("e")).as("e"),
        min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"))
  }

  /** Incrementally admit `newVectors` (vec_id, e): assign against the
    * CURRENT centroids, then MERGE into the cells table — an existing
    * vec_id is re-assigned (update), a new one inserts. commitMerge
    * re-derives on a concurrent-writer race, so two ingest jobs
    * cannot lose each other's vectors. Returns the new version. */
  def refresh(spark: SparkSession, newVectors: DataFrame, dir: String): Long = {
    val centV = VersionedTable.currentVersion(spark, centroidsDir(dir))
      .getOrElse(throw new IllegalStateException(
        s"no committed centroids in $dir — build the index first"))
    val centroids = VersionedTable.read(spark, centroidsDir(dir), Some(centV))
    val assigned = assign(newVectors, centroids)
      .select(col("vec_id"), col("e"), col("cell"))
    val v = Merge.mergeVersioned(spark, cellsDir(dir), assigned, Seq("vec_id"),
      Seq(
        Merge.MatchedUpdate(None,
          Map("e" -> col("s.e"), "cell" -> col("s.cell"))),
        Merge.NotMatchedInsert(None, Map(
          "vec_id" -> col("s.vec_id"), "e" -> col("s.e"),
          "cell" -> col("s.cell")))))
    recordCentroidVersion(spark, dir, v, centV)
    v
  }

  /** Retire vectors from the index — the GDPR/retention motion: one
    * MatchedDelete merge keyed on vec_id, committed as a new cells
    * version (older versions still carry the vector for time travel
    * until `VersionedTable.expireVersions` drops them — the same
    * contract as Delta DELETE, where hard erasure = delete + vacuum).
    * Unknown ids are no-ops. Centroids are untouched: removal never
    * refits the quantizer, so the sidecar records the same centroid
    * version the previous cells version used. */
  def remove(spark: SparkSession, vecIds: Seq[Long], dir: String): Long = {
    import spark.implicits._
    // the surviving rows keep their cell ids, so the matching
    // centroid version is the PREVIOUS cells version's — not
    // necessarily the current centroids (a rebuild may be mid-flight)
    val centV = VersionedTable.currentVersion(spark, cellsDir(dir))
      .flatMap(prev => centroidVersionFor(spark, dir, prev))
      .orElse(VersionedTable.currentVersion(spark, centroidsDir(dir)))
      .getOrElse(throw new IllegalStateException(
        s"no committed index in $dir — build it first"))
    val src = vecIds.distinct.toDF("vec_id")
    val v = Merge.mergeVersioned(spark, cellsDir(dir), src, Seq("vec_id"),
      Seq(Merge.MatchedDelete(None)))
    recordCentroidVersion(spark, dir, v, centV)
    v
  }

  /** Index-coherent retention: expire cells history down to
    * `keepLast` versions, drop the dropped versions' centroid-pair
    * sidecars, and expire every centroids version no RETAINED cells
    * version references (pre-sidecar cells versions conservatively
    * pin everything). This is the hard-erasure half of [[remove]] —
    * after it, a removed vector is gone from every reachable
    * snapshot — and the maintenance face a weekly-rebuild deployment
    * schedules beside [[VersionedTable.compactPartitioned]]. */
  def expire(spark: SparkSession, dir: String, keepLast: Int): Unit = {
    VersionedTable.expireVersions(spark, cellsDir(dir), keepLast)
    val retained = VersionedTable.versions(spark, cellsDir(dir))
    val refs = retained.map(v => centroidVersionFor(spark, dir, v))
    val f = new org.apache.hadoop.fs.Path(cellsDir(dir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // drop sidecars whose cells version no longer exists
    f.listStatus(new org.apache.hadoop.fs.Path(cellsDir(dir))).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith("_CENTROIDS_V"))
      .filter(p => !retained.contains(
        p.getName.stripPrefix("_CENTROIDS_V").toLong))
      .foreach(p => f.delete(p, false))
    // a retained pre-sidecar cells version gives no reference — keep
    // all centroid history rather than guess. expireVersions keeps a
    // COUNT from the newest and referenced versions may interleave
    // with unreferenced ones, so drop only the maximal PREFIX older
    // than every still-needed centroid version.
    if (refs.nonEmpty && refs.forall(_.isDefined)) {
      val oldestNeeded = refs.flatten.min
      val centVs = VersionedTable.versions(spark, centroidsDir(dir))
      val dropPrefix = centVs.takeWhile(_ < oldestNeeded)
      if (dropPrefix.nonEmpty)
        VersionedTable.expireVersions(spark, centroidsDir(dir),
          keepLast = centVs.size - dropPrefix.size)
    }
  }

  /** Top-k cosine neighbors of `qe` served purely from the committed
    * snapshot (optionally time-traveled to `version` of the cells
    * table): centroid ranking on the driver-sized centroid table, a
    * probed-cells scan (row-group-pruned by the sorted layout), and
    * the codegen'd cosine re-score — the `annIvf` probe rule with the
    * FIT replaced by two table reads. */
  def query(spark: SparkSession, dir: String, qe: Seq[Double], k: Int = 10,
      version: Option[Long] = None, excludeVecId: Option[Long] = None)
      : DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    // a pinned cells version pins its MATCHING centroids via the
    // per-version sidecar — ranking new-quantizer centroids against
    // old-quantizer cell ids is exactly the inconsistency time travel
    // exists to avoid. Pre-sidecar indexes fall back to current.
    val centVersion = version.flatMap(v => centroidVersionFor(spark, dir, v))
    val centroids = VersionedTable.read(spark, centroidsDir(dir), centVersion)
      .select(col("cell"), col("ce"))
      .collect()
      .map(r => (r.getInt(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray))
      .sortBy(_._1)
    val qn = {
      var n = 0.0; qe.foreach(x => n += x * x); math.sqrt(n)
    }
    val qu = qe.map(_ / qn).toArray
    // query cell: the assignment rule (argmin euclid, first wins)
    val qcell = centroids.minBy { case (i, c) =>
      var d = 0.0; var j = 0
      while (j < c.length) { val t = qu(j) - c(j); d += t * t; j += 1 }
      (d, i)
    }._1
    val nprobe = math.max(2, math.ceil(centroids.length / 4.0).toInt)
    // ranked probes: centroid cosine, annIvf's rule verbatim
    val ranked = centroids.filter(_._1 != qcell).map { case (i, c) =>
      var dot = 0.0; var n = 0.0; var j = 0
      while (j < c.length) { dot += c(j) * qe(j); n += c(j) * c(j); j += 1 }
      (i, dot / math.sqrt(n))
    }.sortBy(-_._2)
    val probes = qcell +: ranked.take(nprobe - 1).map(_._1)
    import spark.implicits._
    val query = Seq(Tuple1(qe)).toDF("qe")
    val cells = VersionedTable.read(spark, cellsDir(dir), version)
    excludeVecId.fold(cells)(id => cells.filter(col("vec_id") =!= id))
      .filter(col("cell").isin(probes.toIndexedSeq: _*))
      .crossJoin(broadcast(query))
      .withColumn("cosine", round(expr("cosine_sim(e, qe)"), 6))
      .select(col("vec_id"), col("cell"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
