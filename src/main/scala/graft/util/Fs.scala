package graft.util

/** Small local-filesystem helpers shared by the cache invalidators and
  * the verify harness — one copy of the recursive delete instead of a
  * per-caller re-implementation (a fix here reaches every user). */
object Fs {

  /** Temp directory registered for recursive deletion at JVM exit.
    * Session-lifetime memo tables (islands, labels, signature
    * snapshots, DML fixtures) and sink round-trips are correctly
    * scoped to the process — but a bare `createTempDirectory` leaves
    * one directory per invocation on disk FOREVER (thousands of
    * `/tmp/graft_*` dirs across verify/bench runs). Deletion uses NIO
    * directly, so it is independent of Hadoop's own FileSystem
    * shutdown hooks; double-deleting a dir an invalidator already
    * removed is a no-op. */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    exitHook // force the one-time hook registration
    exitRegistry.add(p)
    p
  }

  private val exitRegistry =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private lazy val exitHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(
      () => exitRegistry.forEach { p =>
        try deleteRecursively(p) catch { case _: Throwable => () }
      },
      "graft-tempdir-cleanup"))

  /** Delete `path` recursively if it exists; no-op otherwise. */
  def deleteRecursively(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }
}
