package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SCALAR QUANTIZATION (SQ8) for ANN — the third compression member of the
 * FAISS-style toolbox next to [[IvfIndex]] (list pruning) and [[PqIndex]]
 * (codebook compression): every dimension is linearly requantized to one
 * byte against per-dimension corpus min/max, so a 64-long vector (512 B)
 * becomes 64 single-byte codes + one shared 64x2 stats table. SQ8 is the
 * deployment default when recall matters more than the last 4x of
 * compression (PQ8 here is 8 B/vector, SQ8 is 64 B/vector but lossless to
 * ~1/255 of each dimension's range).
 *
 * Determinism/oracle contract (the r13 discipline): the stats are exact
 * corpus MIN/MAX per dimension (no sampling, no floats); the code is
 * `clamp(((v - mn) * 255) DIV (mx - mn), 0, 255)` and the reconstruction
 * `mn + (code * (mx - mn)) DIV 255` — all exact integer arithmetic with
 * truncating division, the DuckDB `//` mirror (operands can be negative
 * only in the frozen-stats refresh path, where both engines truncate
 * toward zero and the clamp lands on the same byte). Scoring is the
 * asymmetric discipline shared by the whole ANN family: full query
 * vectors, reconstructed corpus vectors, one ROUND(4) at the end.
 *
 * Scale posture: fitting is ONE aggregate scan (128 partial min/max —
 * no shuffle of the corpus, a single result row); encoding is one
 * projection pass; serving reconstructs per row from the codes plus the
 * broadcast-literal stats — the corpus vectors never move. The
 * frozen-stats INGEST path ([[encodeBatch]]) is O(batch), the same
 * standing-artifact lifecycle as IVF/PQ (stats refit = periodic
 * maintenance on drift, exactly like centroid/codebook refit).
 */
object SqIndex {

  /** Per-dimension corpus stats — exact integer min/max (the whole
    * standing "codebook": 2 longs per dimension, always broadcast). */
  case class Stats(mins: Array[Long], maxs: Array[Long]) {
    def dims: Int = mins.length
  }

  /** ONE aggregate scan: per-dimension exact MIN/MAX. No shuffle — 128
    * partially-aggregated scalars reduced to a single row. */
  def fitStats(quantized: DataFrame, dims: Int): Stats = {
    val aggs = (0 until dims).flatMap(i => Seq(
      min(element_at(col("qv"), i + 1)).as(s"mn_$i"),
      max(element_at(col("qv"), i + 1)).as(s"mx_$i")))
    val r = quantized.agg(aggs.head, aggs.tail: _*).collect()(0)
    Stats(Array.tabulate(dims)(i => r.getLong(2 * i)),
      Array.tabulate(dims)(i => r.getLong(2 * i + 1)))
  }

  /** Encode a quantized frame: `(vec_id, codes, recon2)` — one
    * projection, no shuffle. recon2 is the exact squared norm of the
    * reconstruction (computable from codes + stats alone). The per-dim
    * requantize/clamp/reconstruct arithmetic lives in the codegen'd
    * [[graft.functions.SqEncodeCodes]]/[[graft.functions.SqRecon2]]
    * kernels (r17 opt round — the old shape was 64 string-parsed expr()
    * clamps plus a 64-wide reconstruction array squared through dotQ,
    * an O(dims)-node literal tree Catalyst re-analyzed on EVERY
    * per-batch action; identical integer arithmetic, QuantCodecSpec). */
  def encode(quantized: DataFrame, stats: Stats): DataFrame =
    quantized
      .withColumn("codes",
        graft.functions.QuantCodecCols.sqEncode(col("qv"), stats.mins, stats.maxs))
      .withColumn("recon2",
        graft.functions.QuantCodecCols.sqRecon2(col("codes"), stats.mins, stats.maxs))
      .select(col("vec_id"), col("codes"), col("recon2"))

  /** BUILD the full SQ artifact over a corpus: stats + the code table.
    * Cheap relative to IVF/PQ (no k-means — one agg + one projection);
    * [[AnnIndex.sq]] still memoizes it so serves and bench reps share
    * one scan. */
  def buildSq(embeddings: DataFrame, dims: Int = 64): (Stats, DataFrame) = {
    val corpus = Similarity.quantizedWithNorm(embeddings).persist()
    // an EMPTY corpus (e.g. a filter matching nothing) must fail here with
    // a real message, not as an opaque NPE on fitStats' null MIN/MAX
    // aggregates (r15 advice)
    val probe = corpus.select(size(col("qv")).as("len")).limit(1).collect()
    require(probe.nonEmpty,
      "corpus is empty — nothing to fit SQ stats on (check the filter)")
    require(probe(0).getInt(0) == dims,
      s"corpus vectors have ${probe(0).getInt(0)} dims, caller claimed $dims")
    val stats = fitStats(corpus, dims)
    val codes = encode(corpus, stats).localCheckpoint(true)
    corpus.unpersist()
    (stats, codes)
  }

  /** INGEST-path encode against FROZEN stats — O(batch), one projection;
    * out-of-range values clamp to the nearest byte (the quantizer's
    * saturation, the standard SQ posture until a refit). Unioned with a
    * standing code table this equals encoding the grown corpus against
    * the same stats (encoding is per-row). */
  def encodeBatch(embeddings: DataFrame, stats: Stats): DataFrame =
    encode(Similarity.quantizedWithNorm(embeddings), stats)

  /** Asymmetric top-k from a standing SQ artifact: full query vectors
    * (pushed-down re-read, like the PQ/IVF serves), corpus rows
    * reconstructed FROM THEIR CODES on the fly — the original vectors
    * are never read. score = round(dot(q, recon) / (|q| |recon|), 4),
    * rank by (score desc, vec_id). */
  def sqTopKFrom(stats: Stats, codes: DataFrame, embeddings: DataFrame,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val q = Similarity.quantizedWithNorm(
        embeddings.where(col("vec_id").isin(queryIds: _*)))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("norm").as("qnorm"))
    val scored = codes
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.QuantCodecCols.sqReconDot(
            col("qqv"), col("codes"), stats.mins, stats.maxs).cast("double") /
          (col("qnorm") * sqrt(col("recon2").cast("double"))), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** The code table in its query-surface shape: one row per (vec_id,
    * dimension) — relational, so the gate compares it without 64-wide
    * schemas. `i` is 1-based to match the oracle's UNNEST(range(1, ..)). */
  def codeTableFrom(codes: DataFrame): DataFrame =
    codes.select(col("vec_id"),
        posexplode(col("codes")).as(Seq("pos", "code")), col("recon2"))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"),
        col("code"), col("recon2"))

  /**
   * The SINGLE-TABLE IVF-SQ layout — the remaining cell of the compose
   * matrix next to IVFADC ([[PqIndex.ivfpqTable]]): every vector's SQ
   * codes stored WITH its IVF cluster id, `(vec_id, cluster, codes,
   * recon2)`. One corpus-sized join at build time; serving is the
   * broadcast-probe read (FAISS's IVF-SQ8 deployment shape: list
   * pruning + byte-resolution scoring — higher recall than IVFADC at
   * 8x the code size, still 8x smaller than raw vectors).
   */
  def ivfsqTable(assigned: DataFrame, codes: DataFrame): DataFrame =
    assigned.select(col("vec_id"), col("cluster")).join(codes, "vec_id")

  /** IVF-SQ top-k SERVED from the single standing table: the IVF half
    * prunes (broadcast probes onto `cluster`), the SQ half scores
    * (reconstruction from codes + broadcast-literal stats). Queries use
    * their FULL vectors (asymmetric), re-read with a pushed-down vec_id
    * filter — the family's shared serve discipline. */
  def ivfsqTopKFromTable(centroids: Array[Array[Double]], stats: Stats,
      table: DataFrame, embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nProbe: Int): DataFrame = {
    val q = Similarity.quantizedWithNorm(
      embeddings.where(col("vec_id").isin(queryIds: _*)))
    val probes = q
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("norm").as("qnorm"),
        explode(graft.functions.QuantCodecCols.ivfProbeTop(
          col("qv"), centroids, nProbe)).as("cluster"))
    val scored = table
      .join(broadcast(probes), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.QuantCodecCols.sqReconDot(
            col("qqv"), col("codes"), stats.mins, stats.maxs).cast("double") /
          (col("qnorm") * sqrt(col("recon2").cast("double"))), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }
}
