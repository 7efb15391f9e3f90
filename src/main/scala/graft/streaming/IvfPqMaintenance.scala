package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.{IvfIndex, PqIndex}

/**
 * Crash-safe streaming maintenance of the STANDING IVFADC TABLE — the
 * deployment capstone of the ANN family: one stream keeps the single
 * `(vec_id, cluster, recon2, code_0..code_{m-1})` table (the canonical
 * FAISS serving layout, [[graft.operators.PqIndex.ivfpqTable]]) current
 * under ingest, with the same [[ShardLog]] durability contract as
 * [[AnnMaintenance]] (per-batch shards + rolled-up commit markers +
 * compaction; kill/resume byte-identical).
 *
 * Lifecycle: the FIRST batch is the training snapshot — it fits BOTH
 * models (IVF k-means + the M sub-k-means PQ codebooks) and publishes
 * them in ONE atomic rename (`models/` holding `centroids/` + `books/`,
 * visible iff both are complete — no crash window between the two
 * artifacts). Every later batch is O(batch): assign + encode the batch
 * against the frozen models (one scan + one batch-sized stitch join),
 * one shard write, one marker. Model refit stays a periodic maintenance
 * operation under a new root — the posture shared by the whole family.
 *
 * Crash windows are [[AnnMaintenance]]'s, with the two-model publish
 * collapsed into one: a replay after a crash before the `models/` rename
 * refits deterministically (integer truncated-mean k-means) and
 * republishes identical values.
 */
final class IvfPqMaintenance(spark: SparkSession, root: String,
    nLists: Int = 16, iters: Int = 3, m: Int = 8, ksub: Int = 16,
    pqIters: Int = 2, compactEvery: Int = 64, dims: Int = 64) {

  private val log = new ShardLog(spark, root, "codes", compactEvery,
    Seq("vec_id", "cluster", "recon2") ++ (0 until m).map(s => s"code_$s"))

  private val modelsDir = new Path(s"$root/models")
  private def fs = modelsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val centroidSchema = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false)))
  private val bookSchema = StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("c", IntegerType, nullable = false),
    StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false)))

  def committedIds: Seq[Long] = log.committedIds
  def coveredUpTo: Option[Long] = log.coveredUpTo
  def isCommitted(id: Long): Boolean = log.isCommitted(id)
  def committedCount: Long = log.committedCount

  private def modelsPublished: Boolean =
    modelsMemo != null || fs.exists(modelsDir)

  // both models are WRITE-ONCE behind one atomic rename — loaded at most
  // once per instance (the AnnMaintenance codebook-memo discipline)
  @volatile private var modelsMemo: (Array[Array[Double]], Array[Array[Array[Double]]]) = _

  /** The frozen models: (IVF centroids, PQ codebooks). */
  def models(): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    if (modelsMemo == null) {
      require(modelsPublished, "no models published yet (no batch processed)")
      val cents = spark.read.schema(centroidSchema)
        .parquet(new Path(modelsDir, "centroids").toString)
        .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
      val rows = spark.read.schema(bookSchema)
        .parquet(new Path(modelsDir, "books").toString).collect()
      // fail fast on parameter drift (r15 advice): an instance constructed
      // with different m/ksub over an existing root would otherwise yield
      // truncated or empty sub-codebooks and silently wrong codes
      require(cents.length == nLists,
        s"$modelsDir/centroids holds ${cents.length} centroids, instance " +
          s"expects nLists=$nLists — constructor params disagree with the " +
          "published models")
      require(rows.length == m * ksub,
        s"$modelsDir/books holds ${rows.length} codewords, instance " +
          s"expects m*ksub=${m * ksub} (m=$m, ksub=$ksub) — constructor " +
          "params disagree with the published models")
      val books = Array.tabulate(m) { s =>
        rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
          .map(_.getSeq[Double](2).toArray)
      }
      books.zipWithIndex.foreach { case (b, s) =>
        require(b.length == ksub,
          s"$modelsDir/books subspace $s has ${b.length} codewords, " +
            s"expected ksub=$ksub")
      }
      modelsMemo = (cents, books)
    }
    modelsMemo
  }

  private def publishModels(cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): Unit = {
    val tmp = new Path(s"$root/.models.tmp")
    val centRows = cents.zipWithIndex.map { case (cv, i) => Row(i, cv.toSeq) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(centRows.toSeq, 1), centroidSchema)
      .write.mode("overwrite").parquet(new Path(tmp, "centroids").toString)
    val bookRows = for {
      (book, s) <- books.zipWithIndex
      (cv, c) <- book.zipWithIndex
    } yield Row(s, c, cv.toSeq)
    spark.createDataFrame(
        spark.sparkContext.parallelize(bookRows.toSeq, 1), bookSchema)
      .write.mode("overwrite").parquet(new Path(tmp, "books").toString)
    try {
      CommitMarkers.renameOverwrite(spark, fs, tmp, modelsDir)
      modelsMemo = (cents, books)
    } catch {
      case e: Exception =>
        // PROPAGATE (r15 advice): a swallowed publish failure would still
        // let the bootstrap shard+marker commit, and the next batch (or a
        // restart) would re-bootstrap on DIFFERENT data — a standing table
        // mixing codes from two model fits, decoded with one: silent wrong
        // results. Failing the batch means nothing commits and the replay
        // refits deterministically.
        fs.delete(tmp, true)
        throw e
    }
  }

  /**
   * Fold one ingest batch of embeddings `(vec_id, embedding, ...)` into
   * the table. Idempotent; O(batch) after the bootstrap.
   */
  def processBatch(batchId: Long, embs: DataFrame): Unit = {
    if (log.isCommitted(batchId)) return
    val marker =
      s"""{"nLists":$nLists,"iters":$iters,"m":$m,"ksub":$ksub,"pqIters":$pqIters}"""
    if (!modelsPublished) {
      // bootstrap: this batch IS the training snapshot for both models
      val (cents, assigned) = IvfIndex.buildIndex(embs, nLists, iters)
      val (books, codes) = PqIndex.buildPq(embs, m, ksub, pqIters, dims)
      publishModels(cents, books)
      log.commitShard(batchId, PqIndex.ivfpqTable(assigned, codes), marker)
      // the shard parquet is the durable copy — the bootstrap builds'
      // checkpoint blocks are transient and released once it's written
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(assigned)
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(codes)
    } else {
      val (cents, books) = models()
      log.commitShard(batchId, PqIndex.ivfpqTable(
        IvfIndex.assignBatch(embs, cents), PqIndex.encodeBatch(embs, books)),
        marker)
    }
  }

  /** The standing IVFADC table over all committed batches. Plan-time
    * file resolution: drain-then-read (see [[ShardLog]]). */
  def currentTable(): DataFrame = log.currentRows()

  /** Serve approximate top-k from the maintained table (broadcast-probe
    * list pruning + ADC scoring; query vectors re-read from
    * `embeddings` with a pushed-down vec_id filter). */
  def topK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nProbe: Int): DataFrame = {
    val (cents, books) = models()
    PqIndex.ivfadcTopKFromTable(cents, books, currentTable(), embeddings,
      queryIds, k, nProbe)
  }
}
