package graft.util

/** Small local-filesystem helpers shared by the cache invalidators and
  * the verify harness — one copy of the recursive delete instead of a
  * per-caller re-implementation (a fix here reaches every user). */
object Fs {

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
