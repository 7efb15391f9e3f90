package graft.streaming

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path, UnsupportedFileSystemException}
import org.apache.spark.sql.SparkSession

/**
 * Shared commit-marker protocol for foreachBatch state stores
 * ([[StreamingCooc]] and [[IndexMaintenance]]): a batch is restorable iff
 * its `meta/<id>` marker exists, and the marker must APPEAR atomically —
 * including on replay of an already-committed batch, where the old marker
 * is replaced in one step rather than delete-then-rename (r10 advice: the
 * two-step form opened a window where a committed marker was briefly
 * absent, costing one batch of unnecessary replay after a kill in it).
 */
object CommitMarkers {

  /** Atomically rename `tmp` over `dst`, replacing any existing file.
    * Uses FileContext's OVERWRITE rename (atomic on local FS and HDFS);
    * falls back to delete+rename only where FileContext is unsupported —
    * recovery stays correct there via idempotent replay, just one batch
    * less tight. */
  def renameOverwrite(spark: SparkSession, fs: FileSystem,
      tmp: Path, dst: Path): Unit = {
    try {
      val fc = FileContext.getFileContext(fs.getUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, dst, Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: UnsupportedFileSystemException =>
        fs.delete(dst, false)
        require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
    }
  }

  /** Write `content` to `metaDir/<id>` through a dot-prefixed temp
    * sibling + atomic overwrite-rename. */
  def commit(spark: SparkSession, metaDir: Path, id: Long, content: String): Unit = {
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(metaDir, s".$id.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    renameOverwrite(spark, fs, tmp, new Path(metaDir, id.toString))
  }

  /** Batch ids with a committed marker under `metaDir` (unparsable names
    * are ignored — they are temp siblings or debris, never commits). */
  def committed(spark: SparkSession, metaDir: Path): Seq[Long] = {
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaDir)) Seq.empty
    else fs.listStatus(metaDir).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .sorted
  }
}
