package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import PortableHash.{h, P}

/**
 * Similarity search over an embedding column (Array[Float]).
 *
 * Exactness contract: vectors are quantized to integer grids
 * (round(x * 1e6)) before any arithmetic. Dot products and norms are then
 * exact 64-bit integer sums (64 dims x (5e5)^2 ~ 1.6e13 << 2^63, and also
 * << 2^53 so even a double-summing engine gets the identical value) —
 * cosine scores are bit-identical across engines and partitionings.
 *
 * Scale posture:
 *  - Brute-force top-k broadcasts the (small) query set and scans the
 *    corpus once: one pass, no shuffle of the corpus, heap-bounded top-k
 *    per query via window-rank over (query) partitions.
 *  - The LSH path buckets the corpus by random-hyperplane sign bits
 *    (deterministic planes derived from PortableHash); queries probe only
 *    their own bucket (+ optional multi-probe neighbors) — corpus scan
 *    drops to |bucket| ~ N / 2^planes per query.
 */
object Similarity {

  /** Quantize a float-array column to a long-array on the 1e-6 grid. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Exact integer dot product of two quantized vectors (codegen'd). */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.LongArrayDot.dot(a, b)

  /** Cosine similarity of two quantized vectors (double, deterministic). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Cosine from a precomputed dot and per-side norms — the all-pairs
    * scan precomputes sqrt(n2) once per vector instead of per pair. */
  def cosineFromParts(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / (normA * normB)

  /** (vec_id, qv, norm): quantized vector + its precomputed norm. */
  def quantizedWithNorm(embeddings: DataFrame): DataFrame = {
    val q = embeddings.select(col("vec_id"), quantize(col("embedding")).as("qv"))
    q.select(col("vec_id"), col("qv"),
      sqrt(dotQ(col("qv"), col("qv")).cast("double")).as("norm"))
  }

  /**
   * Exact brute-force cosine top-k: for each query vector (vec_id in
   * queryIds), the k nearest corpus vectors (self excluded).
   */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = quantizedWithNorm(embeddings)
    val q = corpus
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("norm").as("qnorm"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosineFromParts(dotQ(col("qqv"), col("qv")), col("qnorm"), col("norm")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /** Exact brute-force cosine top-k for every corpus vector matching
    * `queryPred` — the predicate-relation twin of [[bruteForceTopK]]
    * (the exact side of the batched kNN join's recall measurement). */
  def bruteForceTopKWhere(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = quantizedWithNorm(embeddings)
    val q = corpus
      .where(queryPred)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("norm").as("qnorm"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosineFromParts(dotQ(col("qqv"), col("qv")), col("qnorm"), col("norm")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /**
   * Exact brute-force MAXIMUM-INNER-PRODUCT top-k (MIPS) — the retrieval
   * objective of dot-product-trained embedding models, where the cosine
   * ranking is WRONG (a long vector can win on <q,v> while losing on
   * angle). `dot` is the exact integer <q,v> on the e6 quantization grid
   * (LongArrayDot codegen, no floating point anywhere), so the surface
   * is bit-exact. For an indexed MIPS path, the standard norm-
   * augmentation reduction (append sqrt(maxNorm^2 - |v|^2) to each
   * corpus vector, 0 to queries) turns MIPS into cosine search and the
   * whole IVF family applies unchanged; the exact scan here is the
   * baseline that oracles it.
   */
  def bruteForceTopKDot(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = quantizedWithNorm(embeddings)
    val q = corpus
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dotQ(col("qqv"), col("qv")).as("dot"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("dot"))
  }

  /** Literal sign vector of one hyperplane — public so the DuckDB oracle
    * can mirror the bucket computation exactly (the signs are fixed
    * constants, not data). */
  def planeSigns(plane: Int, dims: Int): IndexedSeq[Long] =
    (0 until dims).map(d => planeSign(plane, d))

  /** Deterministic pseudo-random hyperplane sign for (plane, dim):
    * +1/-1 from the portable hash of "p:d". */
  private def planeSign(plane: Int, dim: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.take(15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
  }

  /** Sign-random-projection bucket id (nPlanes bits) for a quantized vector. */
  def lshBucket(qv: Column, dims: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val signs = array((0 until dims).map(d => lit(planeSign(p, d))): _*)
      when(dotQ(qv, signs) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * Multi-probe LSH approximate top-k: queries score candidates in their
   * own hyperplane bucket plus every hamming-1 neighbor bucket (each probe
   * is one flipped plane), all through a single equi-join on bucket id —
   * the standard trick to trade a small broadcast fan-out (1 + nPlanes
   * rows per query) for ~3x recall. Recall < 1 by design; the spec
   * measures it against bruteForceTopK.
   */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      dims: Int, nPlanes: Int): DataFrame = {
    val bucketed = quantizedWithNorm(embeddings)
      .withColumn("bucket", lshBucket(col("qv"), dims, nPlanes))
    val probes = array(
      col("bucket") +:
        (0 until nPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val q = bucketed
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("norm").as("qnorm"), explode(probes).as("bucket"))
    val scored = bucketed
      .join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosineFromParts(dotQ(col("qqv"), col("qv")), col("qnorm"), col("norm")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }
}
