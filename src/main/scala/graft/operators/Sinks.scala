package graft.operators

/**
 * Per-JVM temporary sink root: one subdirectory per sink name, written
 * with overwrite semantics by every caller — repeated invocations
 * (Bench loops, long-lived sessions) rewrite in place instead of
 * accumulating a fresh temp dir per call. Shared by the batch roundtrip
 * sinks (ExtQueries7) and the streaming upsert sink (StreamingOps).
 */
object Sinks {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_sinks_")
    // deleteOnExit is a no-op for non-empty directories — register a
    // recursive-delete shutdown hook so sink output is actually bounded
    // across JVM runs, not just within one.
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  def dir(name: String): String = root.resolve(name).toString
}
