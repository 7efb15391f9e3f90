package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Memo for the near-dup CLUSTER INDEX — the `(node, comp)` assignment
 * produced by [[Dedup.simhashComponents]] / [[Dedup.minhashComponents]]
 * over a corpus directory.
 *
 * At lakehouse scale the cluster assignment is not a per-query
 * computation: it is built ONCE per corpus snapshot (an O(corpus)
 * LSH + connected-components job) and then every provenance / curation
 * report — source overlap, cluster purity, keep-best selection, sample
 * weights, token savings, dup ratios, leakage repair — is a cheap scan
 * of that persisted index. Two layers express that contract:
 *
 *  - SESSION layer (always on): the first caller for a given
 *    (corpus fingerprint, algorithm, parameter) triple pays for the
 *    build (the result arrives already materialized — both component
 *    builders end in an eager `localCheckpoint`), every later caller in
 *    the same SparkContext reuses the checkpointed blocks.
 *  - DURABLE layer (opt-in): with sysprop `graft.index.cache` (or env
 *    `SPARK_GRAFT_INDEX_CACHE`) set to a directory, a built index is
 *    also persisted there as parquet keyed by the same triple, and a
 *    NEW session LOADS it instead of rebuilding — the real
 *    build-once/scan-many regime across process restarts. Deliberately
 *    OFF by default: the soak protocol measures cold index builds as
 *    one JVM per rep, and a default-on durable cache would silently
 *    turn those cold reps into warm loads.
 *
 * Keying is defensive so a stale entry can never serve a wrong answer:
 *   - the corpus directory's FILE FINGERPRINT (128-bit md5 over relative
 *     path, length, mod-time of every data file — see [[fingerprint]]):
 *     if the driver regenerates testdata mid-session, or two corpora
 *     share file base-names, the keys differ. This mirrors how a real
 *     lakehouse keys the index by table snapshot/version;
 *   - the algorithm + parameters;
 *   - for the session layer additionally the SparkContext identity
 *     (applicationId + startTime): checkpoint blocks die with their
 *     context, so a restarted context misses the session layer and
 *     falls through to the durable one (or rebuilds).
 *
 * Durable publication is crash-safe without markers: the parquet is
 * written to a temp sibling and atomically renamed into its final
 * directory — an entry is visible iff it is complete; a concurrent
 * loser deletes its temp and reads the winner's copy.
 */
object DedupIndex {

  private val cache = new ConcurrentHashMap[String, DataFrame]()

  /** Test-visible count of actual index builds (both cache layers
    * missed). Serving from the durable layer must NOT bump this. */
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong()

  /** 128-bit content-version stamp for a table directory: md5 over the
    * RELATIVE path, length and mod-time of every data file. One FS
    * listing, no data read. (The earlier 32-bit `String.hashCode` over
    * base names collided by birthday at ~77k corpus versions and could
    * not tell apart same-named files in different subdirectories.) */
  private[graft] def fingerprint(spark: SparkSession, tableDir: String): String = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) s"absent:$tableDir"
    else {
      val basePath = p.toUri.getPath
      val it = fs.listFiles(p, true)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath.stripPrefix(basePath)
        parts += s"$rel:${st.getLen}:${st.getModificationTime}"
      }
      md5Hex(parts.sorted.mkString(","))
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def durableRoot: Option[String] =
    sys.props.get("graft.index.cache").orElse(sys.env.get("SPARK_GRAFT_INDEX_CACHE"))

  // the durable layer goes through the Hadoop FileSystem API end-to-end
  // (r12 advice/verdict #5): the previous java.nio resolution made a
  // non-local root (hdfs://, s3a://) silently never hit — every session
  // rebuilt — and durableStore wrote parquet to a bogus local path named
  // after the URI. Hadoop Path handles both plain local dirs and any
  // scheme-qualified URI the cluster's FS supports.
  private def entryPath(root: String, durableKey: String): Path =
    new Path(root, md5Hex(durableKey))

  private def durableLoad(spark: SparkSession, durableKey: String): Option[DataFrame] =
    durableRoot.flatMap { root =>
      val d = entryPath(root, durableKey)
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(d) && fs.getFileStatus(d).isDirectory)
        Some(spark.read.parquet(d.toString))
      else None
    }

  /** Best-effort durable publish: a cache-store failure (disk full, no
    * permission) degrades to session-only memoization, never fails the
    * query. Crash-safe without markers: the parquet is written to a
    * dot-prefixed temp sibling and atomically renamed into place via
    * [[graft.streaming.CommitMarkers.renameOverwrite]] (POSIX rename on
    * local FS, FileContext OVERWRITE rename elsewhere) — an entry is
    * visible iff it is complete. A rename refused because a concurrent
    * builder published first (directory renames do not replace non-empty
    * destinations on any scheme) just drops our redundant copy; the
    * winner's is complete by the same atomicity. */
  private def durableStore(durableKey: String, built: DataFrame): Unit =
    durableRoot.foreach { root =>
      scala.util.Try {
        val spark = built.sparkSession
        val d = entryPath(root, durableKey)
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(d)) {
          val tmp = new Path(root,
            s".tmp_${md5Hex(durableKey)}_${java.lang.ProcessHandle.current.pid}")
          built.write.mode("overwrite").parquet(tmp.toString)
          try graft.streaming.CommitMarkers.renameOverwrite(spark, fs, tmp, d)
          catch { case _: Exception => fs.delete(tmp, true) }
        }
      }.failed.foreach(t => System.err.println(
        s"[DedupIndex] durable store failed (serving session-only): $t"))
    }

  private def memo(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val durableKey =
      s"$tag|${fingerprint(spark, s"$dir/documents.parquet")}"
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$durableKey"
    // computeIfAbsent gives once-per-key builds even under concurrent
    // suites; built values are already eagerly checkpointed by the
    // builder, loaded values are plain parquet scans
    cache.computeIfAbsent(key, _ =>
      durableLoad(spark, durableKey).getOrElse {
        buildCount.incrementAndGet()
        val built = build
        durableStore(durableKey, built)
        built
      })
  }

  /** Memoized `(node, comp)` simhash cluster index over
    * `<dir>/documents.parquet`. */
  def simhashComponents(spark: SparkSession, dir: String, maxHamming: Int): DataFrame =
    memo(spark, dir, s"simhash:$maxHamming") {
      Dedup.simhashComponents(Tables.table(spark, dir, "documents"), maxHamming)
    }

  /** Memoized `(doc_a, doc_b, hamming)` SimHash near-dup PAIR index over
    * `<dir>/documents.parquet` — the standing banded-candidate artifact
    * shared by every consumer of the hamming <= maxHamming pair set
    * (the near-dup listing itself, the precision/recall eval's predicted
    * side, the split-leakage audit). r17 opt round: the three consumers
    * each re-ran the full banded join per invocation; the pair set is a
    * build-once/scan-many index exactly like the cluster index above
    * (which is its connected components). `simhashNearDups` already
    * returns an eagerly checkpointed frame, so the memoized value is
    * scan-shaped for every consumer. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int): DataFrame =
    memo(spark, dir, s"simhashpairs:$maxHamming") {
      Dedup.simhashNearDups(Tables.table(spark, dir, "documents"), maxHamming)
    }

  /** Memoized `(node, comp)` MinHash cluster index over
    * `<dir>/documents.parquet`. */
  def minhashComponents(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    memo(spark, dir, s"minhash:$threshold") {
      Dedup.minhashComponents(Tables.table(spark, dir, "documents"), threshold)
    }

  /** Memoized simhash index over a FILTERED view of the corpus — the
    * standing BASE index of the refresh family, built once per
    * (corpus fingerprint, filter, params) and then merged into by every
    * ingest-shaped query. `tag` must uniquely identify `filter` (it is
    * the filter's cache identity; the Column itself has no stable
    * canonical form). */
  def simhashComponentsFiltered(spark: SparkSession, dir: String,
      maxHamming: Int, tag: String,
      filter: org.apache.spark.sql.Column): DataFrame =
    memo(spark, dir, s"simhash:$maxHamming:flt:$tag") {
      Dedup.simhashComponents(
        Tables.table(spark, dir, "documents").where(filter), maxHamming)
    }

  /** MinHash twin of [[simhashComponentsFiltered]]. */
  def minhashComponentsFiltered(spark: SparkSession, dir: String,
      threshold: Double, tag: String,
      filter: org.apache.spark.sql.Column): DataFrame =
    memo(spark, dir, s"minhash:$threshold:flt:$tag") {
      Dedup.minhashComponents(
        Tables.table(spark, dir, "documents").where(filter), threshold)
    }

  /** Test hook: drop all memoized entries (blocks are released lazily by
    * the context's GC of unreferenced checkpoint RDDs). Also what a new
    * SparkContext effectively does — its session-layer keys all miss. */
  private[graft] def invalidateAll(): Unit = cache.clear()
}
