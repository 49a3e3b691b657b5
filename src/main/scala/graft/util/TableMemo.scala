package graft.util

/** Memoized WRITTEN-TABLE path per (session, dir) — ONE copy of the
  * lifecycle idiom every dir-keyed table memo in the engine shares
  * (islands summary, Z-ordered skip table, DML fixture, shredded
  * events, shard table, tokenizer artifact). The shape exists because
  * a persisted frame dies under the bench/anchor harnesses' per-query
  * cache clearing, while a written parquet/VersionedTable survives
  * and costs one scan.
  *
  * Lifecycle rules the helper centralizes (each was a hand-propagated
  * fix across the former per-site copies):
  *  - WEAK session key + plain String value, so a dropped session
  *    becomes collectable (a value referencing the session would pin
  *    the key forever);
  *  - builds SERIALIZE on the per-session map: TrieMap.getOrElseUpdate
  *    may evaluate a racing first caller's builder twice, and the
  *    loser's fully-written table would leak untracked (the round-4
  *    memo rule);
  *  - invalidation clears the memo AND deletes the written tables, so
  *    it reclaims disk, not just the pointer — without it a
  *    regenerated fixture dir in-session would silently serve stale
  *    data.
  */
final class TableMemo {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, String]])

  /** The memoized table path for `dir`, running `build` on first call. */
  def getOrBuild(spark: org.apache.spark.sql.SparkSession, dir: String)(
      build: => String): String = {
    val perSession = cache.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[String, String])
    perSession.synchronized {
      perSession.getOrElseUpdate(dir, build)
    }
  }

  /** Clears the memo and deletes every written table it tracked. */
  def invalidate(): Unit = {
    val paths = cache.synchronized {
      val ps = scala.jdk.CollectionConverters.CollectionHasAsScala(
        cache.values).asScala.flatMap(_.values).toList
      cache.clear()
      ps
    }
    paths.foreach(Fs.deleteRecursively)
  }
}
