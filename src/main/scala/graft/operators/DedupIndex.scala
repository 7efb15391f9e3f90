package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session-lifetime memo for the near-dup CLUSTER INDEX — the
 * `(node, comp)` assignment produced by [[Dedup.simhashComponents]] /
 * [[Dedup.minhashComponents]] over a corpus directory.
 *
 * At lakehouse scale the cluster assignment is not a per-query
 * computation: it is built ONCE per corpus snapshot (an O(corpus)
 * LSH + connected-components job) and then every provenance / curation
 * report — source overlap, cluster purity, keep-best selection, sample
 * weights, token savings, dup ratios, leakage repair — is a cheap scan
 * of that persisted index. This object expresses exactly that contract
 * inside one SparkSession: the first caller for a given
 * (corpus fingerprint, algorithm, parameter) triple pays for the build
 * (the result arrives already materialized — both component builders
 * end in an eager `localCheckpoint`), every later caller reuses the
 * checkpointed blocks.
 *
 * Keying is defensive on three axes so a stale entry can never serve a
 * wrong answer:
 *   - the SparkContext identity (applicationId + startTime): checkpoint
 *     blocks die with their context, so a restarted context misses;
 *   - the corpus directory;
 *   - a FILE FINGERPRINT of the directory (relative path, length,
 *     mod-time of every data file): if the driver regenerates testdata
 *     mid-session the fingerprint changes and the index is rebuilt.
 *     This mirrors how a real lakehouse keys the index by table
 *     snapshot/version rather than by path.
 */
object DedupIndex {

  private val cache = new ConcurrentHashMap[String, DataFrame]()

  /** Cheap content-version stamp for a table directory: one FS listing,
    * no data read. */
  private def fingerprint(spark: SparkSession, tableDir: String): String = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) s"absent:$tableDir"
    else {
      val it = fs.listFiles(p, true)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        parts += s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
      }
      parts.sorted.mkString(",").hashCode.toString
    }
  }

  private def memo(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val key = s"${sc.applicationId}@${sc.startTime}|$tag|$dir|" +
      fingerprint(spark, s"$dir/documents.parquet")
    // computeIfAbsent gives once-per-key builds even under concurrent
    // suites; the value is already eagerly checkpointed by the builder
    cache.computeIfAbsent(key, _ => build)
  }

  /** Memoized `(node, comp)` simhash cluster index over
    * `<dir>/documents.parquet`. */
  def simhashComponents(spark: SparkSession, dir: String, maxHamming: Int): DataFrame =
    memo(spark, dir, s"simhash:$maxHamming") {
      Dedup.simhashComponents(Tables.table(spark, dir, "documents"), maxHamming)
    }

  /** Memoized `(node, comp)` MinHash cluster index over
    * `<dir>/documents.parquet`. */
  def minhashComponents(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    memo(spark, dir, s"minhash:$threshold") {
      Dedup.minhashComponents(Tables.table(spark, dir, "documents"), threshold)
    }

  /** Test hook: drop all memoized entries (blocks are released lazily by
    * the context's GC of unreferenced checkpoint RDDs). */
  private[graft] def invalidateAll(): Unit = cache.clear()
}
