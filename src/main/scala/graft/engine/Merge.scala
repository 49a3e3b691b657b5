package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style MERGE clause matrix over plain DataFrames — the full
  * `WHEN MATCHED [AND cond] THEN UPDATE/DELETE` / `WHEN NOT MATCHED
  * [AND cond] THEN INSERT` surface a lakehouse user reaches for
  * weekly (the reference's refresh jobs express the unconditional
  * special case; see q_merge_upsert).
  *
  * Semantics match the public Delta Lake MERGE contract:
  *  - target rows matched by the source evaluate the MATCHED clauses
  *    in declaration order; the FIRST clause whose condition holds
  *    applies (update or delete), and a matched row no clause claims
  *    is carried through unchanged;
  *  - unmatched target rows evaluate the NOT MATCHED BY SOURCE
  *    clauses in order (Delta's third clause family — the
  *    sync-deletion / aging surface); the first applicable one
  *    updates or deletes, otherwise the row carries through;
  *  - unmatched source rows evaluate the NOT MATCHED clauses in
  *    order; the first applicable one inserts, otherwise the source
  *    row is discarded;
  *  - more than one source row matching a single target row is
  *    ambiguous and rejected (same error Delta raises) — checked
  *    distributedly, no collect.
  *
  * Execution shape: ONE equi-join (full outer) on the merge keys plus
  * per-row CASE expressions — a single key shuffle at any scale, with
  * Spark free to broadcast the source side when it is dim-sized, and
  * every clause condition/assignment a codegen'd Column expression.
  * Clause conditions reference the two sides through the aliases
  * `t` (target) and `s` (source), e.g. `col("s.op") === "del"`.
  */
object Merge {

  sealed trait Clause
  /** WHEN MATCHED [AND cond] THEN UPDATE SET col -> expr (unlisted
    * target columns keep their current value). */
  final case class MatchedUpdate(cond: Option[Column],
      set: Map[String, Column]) extends Clause
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  final case class MatchedDelete(cond: Option[Column]) extends Clause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (unlisted target columns
    * insert as NULL, like Delta's omitted columns). */
  final case class NotMatchedInsert(cond: Option[Column],
      values: Map[String, Column]) extends Clause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE — conditions
    * and assignments may reference only the `t` side (no source row
    * exists for these). */
  final case class NotMatchedBySourceUpdate(cond: Option[Column],
      set: Map[String, Column]) extends Clause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE — the
    * "remove rows the source no longer carries" sync motion. */
  final case class NotMatchedBySourceDelete(cond: Option[Column])
      extends Clause

  /** Marker appended to each side pre-join: after a full outer join
    * its null-ness is the presence test (key columns can be NULL on
    * either side, so testing them would misclassify). */
  private val tMark = "__graft_t_present"
  private val sMark = "__graft_s_present"

  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      clauses: Seq[Clause]): DataFrame = {
    require(keys.nonEmpty, "MERGE needs at least one key column")
    require(clauses.nonEmpty, "MERGE needs at least one clause")
    val outCols = target.columns.toSeq
    val matchedClauses = clauses.collect {
      case c: MatchedUpdate => c: Clause
      case c: MatchedDelete => c: Clause
    }
    val insertClauses = clauses.collect { case c: NotMatchedInsert => c }
    val bySourceClauses = clauses.collect {
      case c: NotMatchedBySourceUpdate => c: Clause
      case c: NotMatchedBySourceDelete => c: Clause
    }

    // Delta's ambiguity rule: a target row matched by >1 source row
    // has no well-defined clause outcome. One aggregation on the
    // already-shuffled key, fused into the same plan via a join —
    // never a driver-side check.
    val dupSourceKeys = source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select(keys.map(col): _*)

    val t = target.withColumn(tMark, lit(true)).alias("t")
    val s = source.withColumn(sMark, lit(true)).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k"))
      .reduce(_ && _)
    val j = t.join(s, joinCond, "full_outer")

    val isMatched = col(s"t.$tMark").isNotNull && col(s"s.$sMark").isNotNull
    val targetOnly = col(s"t.$tMark").isNotNull && col(s"s.$sMark").isNull
    val sourceOnly = col(s"t.$tMark").isNull && col(s"s.$sMark").isNotNull

    // Action resolution: CASE evaluates in order, so "first applicable
    // clause wins" is exactly a when-chain per row population.
    // Encoding: -1 keep (unclaimed match / unclaimed target-only),
    // -2 drop (delete, or unmatched source no clause wants), and
    // DISJOINT index ranges per clause family — matched updates at i,
    // inserts at 1000+i, by-source updates at 2000+i — so a value
    // expression can never fire for the wrong population (same-index
    // clauses from different families collide otherwise).
    val keep = lit(-1)
    val drop = lit(-2)
    val insertBase = 1000
    val bySourceBase = 2000
    val matchedAction = matchedClauses.zipWithIndex
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), keep)) {
        case (chain, (c, i)) =>
          val (cond, act) = c match {
            case MatchedUpdate(cd, _) => (cd.getOrElse(lit(true)), lit(i))
            case MatchedDelete(cd) => (cd.getOrElse(lit(true)), drop)
            case _ => (lit(false), keep)
          }
          chain.when(cond, act)
      }.otherwise(keep)
    val insertAction = insertClauses.zipWithIndex
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), keep)) {
        case (chain, (NotMatchedInsert(cd, _), i)) =>
          chain.when(cd.getOrElse(lit(true)), lit(insertBase + i))
      }.otherwise(drop)
    val bySourceAction = bySourceClauses.zipWithIndex
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), keep)) {
        case (chain, (c, i)) =>
          val (cond, act) = c match {
            case NotMatchedBySourceUpdate(cd, _) =>
              (cd.getOrElse(lit(true)), lit(bySourceBase + i))
            case NotMatchedBySourceDelete(cd) =>
              (cd.getOrElse(lit(true)), drop)
            case _ => (lit(false), keep)
          }
          chain.when(cond, act)
      }.otherwise(keep)
    val action = when(isMatched, matchedAction)
      .when(targetOnly, bySourceAction)
      .when(sourceOnly, insertAction)

    // Per-column value: keyed off the resolved action, so exactly the
    // winning clause's assignment applies; everything else falls back
    // to the target value (NULL for inserts of unlisted columns).
    def valueOf(cn: String): Column = {
      val base = when(sourceOnly, lit(null)).otherwise(col(s"t.$cn"))
      val withUpdates = matchedClauses.zipWithIndex.foldLeft(base) {
        case (acc, (MatchedUpdate(_, set), i)) if set.contains(cn) =>
          when(col("__action") === i, set(cn)).otherwise(acc)
        case (acc, _) => acc
      }
      val withBySource = bySourceClauses.zipWithIndex.foldLeft(withUpdates) {
        case (acc, (NotMatchedBySourceUpdate(_, set), i)) if set.contains(cn) =>
          when(col("__action") === (bySourceBase + i), set(cn)).otherwise(acc)
        case (acc, _) => acc
      }
      insertClauses.zipWithIndex.foldLeft(withBySource) {
        case (acc, (NotMatchedInsert(_, values), i)) if values.contains(cn) =>
          when(col("__action") === (insertBase + i), values(cn)).otherwise(acc)
        case (acc, _) => acc
      }.as(cn)
    }

    val resolved = j.withColumn("__action", action)
      .filter(col("__action") =!= drop)
      .select(outCols.map(valueOf): _*)

    // Ambiguity enforcement: count duplicated source keys that match
    // a target row (a key aggregate + semi join, both on the already-
    // shuffled key) and fail the job through `assert_true` if it is
    // nonzero — through TWO complementary carriers, because each has
    // an escape path the other closes:
    //  - a zero-or-poison frame UNIONED into the output covers EMPTY
    //    outputs (an unconditional MatchedDelete that drops every row
    //    — a per-row guard evaluates zero times there), but a
    //    limit-pruned consumer (merge(...).limit(1)) can satisfy its
    //    CollectLimit from the resolved child's partitions and never
    //    execute the poison partition;
    //  - a per-row predicate (the 1-row ambiguity count broadcast
    //    into every output row) covers any PARTIAL consumption of a
    //    non-empty output, and an empty-output limit scan falls
    //    through to the poison partition.
    // The asserts live in FILTERs (not projections) so column pruning
    // cannot elide them; when __n_amb = 0 both carriers are free.
    val ambMsg = "MERGE: multiple source rows match one target row"
    val ambCount = dupSourceKeys
      .join(target.select(keys.map(col): _*), keys, "left_semi")
      .agg(count(lit(1)).as("__n_amb"))
    val resolvedSchema = resolved.schema
    val poison = ambCount
      .filter(col("__n_amb") > 0 &&
        assert_true(col("__n_amb") === 0, lit(ambMsg)).isNull)
      .select(outCols.map(cn =>
        lit(null).cast(resolvedSchema(cn).dataType).as(cn)): _*)
    val guarded = resolved.select(outCols.map(col): _*)
      .crossJoin(broadcast(ambCount))
      .filter(col("__n_amb") === 0 ||
        assert_true(col("__n_amb") === 0, lit(ambMsg)).isNull)
      .select(outCols.map(col): _*)
    guarded.unionByName(poison)
  }

  /** The committed face: merge `source` into the `VersionedTable` at
    * `dir` and commit the result as a new version. Runs through
    * [[VersionedTable.commitMerge]], so a concurrent writer landing
    * between base read and commit triggers a RE-DERIVATION against
    * the fresh base — the merge is re-evaluated, never blindly
    * re-committed (the lost-update closure the incremental-dedup
    * snapshot cycle uses). An absent table bootstraps from the
    * NOT MATCHED clauses alone (empty target of the source's key
    * columns + provided value columns). */
  def mergeVersioned(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], clauses: Seq[Clause],
      bootstrapSchema: Option[org.apache.spark.sql.types.StructType] = None,
      maxAttempts: Int = 10, allowEvolution: Boolean = false): Long =
    VersionedTable.commitMerge(spark, dir, maxAttempts = maxAttempts,
        allowEvolution = allowEvolution) { baseOpt =>
      val base = baseOpt.getOrElse {
        val schema = bootstrapSchema.getOrElse(throw new IllegalArgumentException(
          "mergeVersioned into an absent table needs bootstrapSchema"))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
      merge(base, source, keys, clauses)
    }

  /** Incremental MIRROR sync — the changelog consumer the CDF
    * primitives exist for, composed entirely from the engine's own
    * parts: read the source table's changes past the mirror's stored
    * cursor ([[VersionedTable.readChangesSince]]), apply them as ONE
    * MERGE (delete rows the changelog deleted, upsert inserts and
    * post-images), commit the mirror, then advance the cursor. Each
    * run costs one changelog diff + one key-join merge, however much
    * history accumulated — never a full source rescan after
    * bootstrap.
    *
    * Crash contract: the cursor advances AFTER the mirror commit, so
    * a crash between them re-applies the same window on the next run
    * — which is idempotent by construction (re-deleting an absent key
    * matches no clause; re-upserting lands identical values).
    * Returns the source version the mirror now reflects. */
  def syncMirror(spark: SparkSession, srcDir: String, dstDir: String,
      keys: Seq[String]): Long = {
    val cursorName = "_SYNC_CURSOR"
    val f = new org.apache.hadoop.fs.Path(dstDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cp = new org.apache.hadoop.fs.Path(dstDir, cursorName)
    val since =
      if (!f.exists(cp)) -1L
      else {
        val in = f.open(cp)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      }
    val (changes, newCur) = VersionedTable.readChangesSince(
      spark, srcDir, since, keys)
    if (since < 0L) {
      // bootstrap: the whole snapshot reads as inserts
      VersionedTable.commit(changes.drop("_change_type"), dstDir)
    } else if (newCur != since) {
      val net = changes.filter(col("_change_type") =!= "update_preimage")
      val dataCols = changes.columns.filterNot(_ == "_change_type").toSeq
      val nonDelete = col("s._change_type") =!= "delete"
      mergeVersioned(spark, dstDir, net, keys, Seq(
        MatchedDelete(Some(col("s._change_type") === "delete")),
        MatchedUpdate(Some(nonDelete),
          dataCols.filterNot(keys.contains)
            .map(c => c -> col(s"s.$c")).toMap),
        NotMatchedInsert(Some(nonDelete),
          dataCols.map(c => c -> col(s"s.$c")).toMap)))
    }
    VersionedTable.atomicWrite(spark, dstDir, cursorName, newCur.toString)
    newCur
  }
}
