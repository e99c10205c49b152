package graft.util

/** Temp directories that delete themselves at JVM exit — q29/entry/bench
  * engine runs materialize full crawl state under /tmp and their tables
  * are read lazily after run() returns, so the earliest safe deletion
  * point is shutdown (repeated bench/verify loops otherwise fill /tmp). */
object TempDirs {
  def create(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    try {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { val _ = java.nio.file.Files.deleteIfExists(f) })
      finally s.close()
    } catch { case _: Exception => () }
  }
}
