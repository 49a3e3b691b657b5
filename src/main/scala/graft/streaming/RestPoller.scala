package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** S1: REST-polling face. The reference's producer polls the OpenSky
  * REST API on a fixed cadence and pushes each response into the
  * stream (`services/producer/producer.py:63-98`). Polling is a
  * service concern, not a query-engine concern — the engine boundary
  * is the bronze directory — so this utility adapts any fetch thunk
  * (HTTP client, file tail, deterministic fake) onto that boundary:
  * each poll appends one uniquely-named JSONL batch file, written
  * ATOMICALLY (temp + rename) so the incremental file stream
  * (S11/X4, `Pipelines.bronzeSource` + checkpoint) can never observe
  * a half-written batch, and ingests each batch exactly once.
  *
  * The build env has zero egress, so specs exercise the seam with a
  * deterministic fake fetcher; a real deployment passes an HTTP
  * client closure (the `java.net.http.HttpClient` two-liner) — the
  * engine side is identical either way.
  */
object RestPoller {

  /** One poll: fetch lines, land them as `rest_batch_<id>.jsonl`.
    * Returns the batch file path, or None when the fetch yields
    * nothing (empty responses produce no file, mirroring the
    * producer's skip-on-empty behavior). */
  def pollOnce(
      fetch: () => Seq[String],
      bronzeDir: String,
      batchId: Long): Option[Path] = {
    val lines = fetch()
    if (lines.isEmpty) None
    else {
      val dir = Paths.get(bronzeDir)
      Files.createDirectories(dir)
      // dot-prefixed temp is invisible to Spark's file source; the
      // rename is atomic on POSIX/HDFS-style filesystems
      val tmp = dir.resolve(s"._rest_batch_$batchId.jsonl.tmp")
      val dst = dir.resolve(s"rest_batch_$batchId.jsonl")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      Some(dst)
    }
  }

  /** Driver-side polling loop for operational use: `maxBatches` polls
    * `intervalMs` apart (the reference's FLUSH_INTERVAL cadence).
    * Returns the files written. Kept deliberately simple — at scale
    * the poller runs beside the streaming query, not inside it, and
    * multiple pollers stay safe because batch ids are disjoint per
    * poller instance. */
  def pollLoop(
      fetch: () => Seq[String],
      bronzeDir: String,
      intervalMs: Long,
      maxBatches: Int,
      firstBatchId: Long = 0L): Seq[Path] =
    (0 until maxBatches).flatMap { i =>
      val p = pollOnce(fetch, bronzeDir, firstBatchId + i)
      if (i < maxBatches - 1 && intervalMs > 0) Thread.sleep(intervalMs)
      p
    }
}
