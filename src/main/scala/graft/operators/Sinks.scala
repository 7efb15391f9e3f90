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
    p.toFile.deleteOnExit()
    p
  }

  def dir(name: String): String = root.resolve(name).toString
}
