package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * STANDING ANN index lifecycle — the IVF centroids + cluster-assignment
 * artifact of [[IvfIndex]] managed exactly like the dedup cluster index
 * in [[DedupIndex]]: built ONCE per (corpus fingerprint, parameters),
 * served many times, refreshed incrementally on ingest.
 *
 * Rationale (r13 verdict #1): at lakehouse scale the IVF index is not a
 * per-query computation — fitting k-means and re-assigning the whole
 * corpus on every top-k call is an O(corpus x iters) job serving an
 * O(probe) question. The reference's own core design is incremental
 * maintenance of a standing similarity artifact (the co-occurrence
 * matrix: flink-cooccurrence
 * ItemRowRescorerTwoInputStreamOperator.java:158-228 folds per-item
 * deltas into standing state rather than recomputing the matrix); the
 * ANN family gets the same lifecycle here:
 *
 *  - SESSION layer (always on): first caller for a key pays the build
 *    (centroids collected driver-side — nLists x dims doubles, tiny;
 *    assignment eagerly localCheckpointed), later callers reuse.
 *  - DURABLE layer (opt-in, sysprop `graft.index.cache` or env
 *    `SPARK_GRAFT_INDEX_CACHE`): the index is persisted as parquet —
 *    `centroids/` (nLists small rows) and `assign/` PARTITIONED BY
 *    cluster, the physical inverted-file layout: a standing-index probe
 *    reads only the probed clusters' partitions (broadcast-hash probe
 *    join + dynamic partition pruning), ~nProbe/nLists of the corpus.
 *    Same crash-safe publication as DedupIndex: temp dir + atomic
 *    rename, an entry is visible iff complete. OFF by default for the
 *    same reason (cold-build soak measurements).
 *  - INGEST refresh: [[refreshedAssign]] assigns ONLY the incoming batch
 *    against the standing centroids (O(batch), no refit, no corpus
 *    re-scan) and unions it with the standing assignment — byte-equal to
 *    assigning the grown corpus against the same centroids, which is the
 *    full-rebuild contract the `ann_index_refresh` oracle replays.
 *    Centroid REFIT is deliberately NOT per-batch: like compaction in
 *    [[graft.streaming.IndexMaintenance]], refit is a periodic
 *    maintenance operation (drop the key, rebuild), not an ingest-path
 *    cost — the standard IVF deployment posture (train once on a
 *    snapshot, assign forever, retrain on drift).
 *
 * Keying mirrors DedupIndex: corpus-file fingerprint (128-bit md5 over
 * path/length/mtime of every data file) + algorithm parameters; the
 * session layer additionally keys on the SparkContext identity so a
 * restarted context falls through to the durable layer or rebuilds.
 */
object AnnIndex {

  /** A standing IVF index: driver-side centroids (exact integer-valued
    * doubles — see IvfIndex's truncated-mean) + the materialized assignment
    * `(vec_id, qv, norm, cluster)`. */
  case class Ivf(centroids: Array[Array[Double]], assigned: DataFrame)

  private val cache = new ConcurrentHashMap[String, Ivf]()

  /** Test-visible count of actual index builds (both layers missed). */
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong()

  private def durableRoot: Option[String] =
    sys.props.get("graft.index.cache").orElse(sys.env.get("SPARK_GRAFT_INDEX_CACHE"))

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private val centroidSchema = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private def durableLoad(spark: SparkSession, durableKey: String): Option[Ivf] =
    durableRoot.flatMap { root =>
      val d = new Path(root, md5Hex(durableKey))
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(d) && fs.getFileStatus(d).isDirectory) {
        val cents = spark.read.schema(centroidSchema)
          .parquet(new Path(d, "centroids").toString)
          .collect().sortBy(_.getInt(0))
          .map(_.getSeq[Double](1).toArray)
        // partition column comes back typed from the directory names —
        // normalize to the buildIndex layout/types explicitly
        val assigned = spark.read.parquet(new Path(d, "assign").toString)
          .select(col("vec_id").cast("long"), col("qv"), col("norm"),
            col("cluster").cast("int"))
        Some(Ivf(cents, assigned))
      } else None
    }

  /** Best-effort durable publish (failure degrades to session-only).
    * assign/ is PARTITIONED BY cluster — the inverted-file layout that
    * makes a probe read only its lists. */
  private def durableStore(spark: SparkSession, durableKey: String, built: Ivf): Unit =
    durableRoot.foreach { root =>
      scala.util.Try {
        val d = new Path(root, md5Hex(durableKey))
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(d)) {
          val tmp = new Path(root,
            s".tmp_${md5Hex(durableKey)}_${java.lang.ProcessHandle.current.pid}")
          val centRows = built.centroids.zipWithIndex.map { case (cv, i) =>
            Row(i, cv.toSeq)
          }
          spark.createDataFrame(
              spark.sparkContext.parallelize(centRows.toSeq, 1), centroidSchema)
            .write.mode("overwrite").parquet(new Path(tmp, "centroids").toString)
          built.assigned.write.mode("overwrite")
            .partitionBy("cluster").parquet(new Path(tmp, "assign").toString)
          try graft.streaming.CommitMarkers.renameOverwrite(spark, fs, tmp, d)
          catch { case _: Exception => fs.delete(tmp, true) }
        }
      }.failed.foreach(t => System.err.println(
        s"[AnnIndex] durable store failed (serving session-only): $t"))
    }

  private def memo(spark: SparkSession, dir: String, tag: String)
      (build: => Ivf): Ivf = {
    val sc = spark.sparkContext
    val durableKey =
      s"$tag|${DedupIndex.fingerprint(spark, s"$dir/embeddings.parquet")}"
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$durableKey"
    cache.computeIfAbsent(key, _ =>
      durableLoad(spark, durableKey).getOrElse {
        buildCount.incrementAndGet()
        val built = build
        durableStore(spark, durableKey, built)
        built
      })
  }

  /** Memoized standing IVF index over `<dir>/embeddings.parquet`. */
  def ivf(spark: SparkSession, dir: String, nLists: Int, iters: Int): Ivf =
    memo(spark, dir, s"ivf:$nLists:$iters") {
      val (c, a) = IvfIndex.buildIndex(Tables.table(spark, dir, "embeddings"), nLists, iters)
      Ivf(c, a)
    }

  /** Memoized standing IVF index over a FILTERED view of the corpus —
    * the BASE snapshot of the ingest-refresh family. `tag` must uniquely
    * identify `filter` (its cache identity; a Column has no stable
    * canonical form). */
  def ivfFiltered(spark: SparkSession, dir: String, nLists: Int, iters: Int,
      tag: String, filter: Column): Ivf =
    memo(spark, dir, s"ivf:$nLists:$iters:flt:$tag") {
      val (c, a) = IvfIndex.buildIndex(
        Tables.table(spark, dir, "embeddings").where(filter), nLists, iters)
      Ivf(c, a)
    }

  /** Serve approximate top-k from a standing index. */
  def topK(idx: Ivf, queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame =
    IvfIndex.topKFrom(idx.centroids, idx.assigned, queryIds, k, nProbe)

  // ------------------------------------------------------------------
  // PQ artifact — same lifecycle, second cache (books + code table)
  // ------------------------------------------------------------------

  /** A standing PQ artifact: per-subspace codebooks + the materialized
    * code table `(vec_id, recon2, code_0..code_{m-1})`. */
  case class Pq(books: Array[Array[Array[Double]]], codes: DataFrame)

  private val pqCache = new ConcurrentHashMap[String, Pq]()

  /** Test-visible count of actual PQ builds (both layers missed). */
  private[graft] val pqBuildCount = new java.util.concurrent.atomic.AtomicLong()

  private val bookSchema = StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("c", IntegerType, nullable = false),
    StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private def pqDurableLoad(spark: SparkSession, durableKey: String): Option[Pq] =
    durableRoot.flatMap { root =>
      val d = new Path(root, md5Hex(durableKey))
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(d) && fs.getFileStatus(d).isDirectory) {
        val rows = spark.read.schema(bookSchema)
          .parquet(new Path(d, "books").toString).collect()
        val m = rows.map(_.getInt(0)).max + 1
        val books = Array.tabulate(m) { s =>
          rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
            .map(_.getSeq[Double](2).toArray)
        }
        Some(Pq(books, spark.read.parquet(new Path(d, "codes").toString)))
      } else None
    }

  private def pqDurableStore(spark: SparkSession, durableKey: String, built: Pq): Unit =
    durableRoot.foreach { root =>
      scala.util.Try {
        val d = new Path(root, md5Hex(durableKey))
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(d)) {
          val tmp = new Path(root,
            s".tmp_${md5Hex(durableKey)}_${java.lang.ProcessHandle.current.pid}")
          val bookRows = for {
            (book, s) <- built.books.zipWithIndex
            (cv, c) <- book.zipWithIndex
          } yield Row(s, c, cv.toSeq)
          spark.createDataFrame(
              spark.sparkContext.parallelize(bookRows.toSeq, 1), bookSchema)
            .write.mode("overwrite").parquet(new Path(tmp, "books").toString)
          built.codes.write.mode("overwrite").parquet(new Path(tmp, "codes").toString)
          try graft.streaming.CommitMarkers.renameOverwrite(spark, fs, tmp, d)
          catch { case _: Exception => fs.delete(tmp, true) }
        }
      }.failed.foreach(t => System.err.println(
        s"[AnnIndex] PQ durable store failed (serving session-only): $t"))
    }

  /** Memoized standing PQ artifact over `<dir>/embeddings.parquet`. */
  def pq(spark: SparkSession, dir: String, m: Int, ksub: Int, iters: Int,
      dims: Int = 64): Pq = {
    val sc = spark.sparkContext
    val durableKey =
      s"pq:$m:$ksub:$iters:$dims|${DedupIndex.fingerprint(spark, s"$dir/embeddings.parquet")}"
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$durableKey"
    pqCache.computeIfAbsent(key, _ =>
      pqDurableLoad(spark, durableKey).getOrElse {
        pqBuildCount.incrementAndGet()
        val (books, codes) = PqIndex.buildPq(
          Tables.table(spark, dir, "embeddings"), m, ksub, iters, dims)
        val built = Pq(books, codes)
        pqDurableStore(spark, durableKey, built)
        built
      })
  }

  /** Ingest refresh: the standing assignment grown by one batch —
    * assigns ONLY `batch` against the standing centroids (O(batch)) and
    * unions with the standing rows. Equal by construction to assigning
    * the whole grown corpus against the same centroids (assignment is
    * per-row), which is what the refresh oracle replays. */
  def refreshedAssign(idx: Ivf, batch: DataFrame): DataFrame =
    idx.assigned.unionByName(IvfIndex.assignBatch(batch, idx.centroids))

  /** Test hook: drop all memoized entries (both artifact caches). */
  private[graft] def invalidateAll(): Unit = { cache.clear(); pqCache.clear() }
}
