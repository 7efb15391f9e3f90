package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Retrieval composition over the documents + embeddings pair: sparse
 * lexical ranking (BM25), reciprocal-rank fusion of heterogeneous
 * rankings (the standard hybrid-retrieval combiner: Cormack et al.,
 * "Reciprocal Rank Fusion outperforms Condorcet and individual Rank
 * Learning Methods", SIGIR 2009), and ColBERT-style late-interaction
 * scoring (maxsim) over sub-vector token decompositions.
 *
 * Reference relationship: the reference engine's rescorer merges
 * multiple evidence streams into one ranked top-K per key
 * (flink-cooccurrence ItemRowRescorerTwoInputStreamOperator.java
 * :158-228 — LLR rescoring of co-occurrence evidence); RRF is the same
 * move over retrieval legs, expressed as one outer join + window rank.
 *
 * Scale posture:
 *  - BM25: df/avgdl are tiny aggregates (broadcast); the term filter
 *    prunes the exploded token stream before the tf groupBy, so the
 *    shuffle carries only matching (doc, term) rows.
 *  - RRF: each leg is already a top-N list (N rows per leg, KBs); the
 *    fuse is an N-row full outer join — driver-free, broadcast-sized.
 *  - maxsim: one corpus scan joined against the broadcast query side;
 *    the token cross-product (nTok^2 integer dots per pair) runs inside
 *    ONE codegen'd projection (higher-order array functions over the
 *    quantized vectors) — no explode, no extra shuffle: the same
 *    all-pairs shape as the exact cosine scan, with a richer scorer.
 *
 * Exactness: BM25 rides the repo's float discipline (per-term scores
 * rounded to 1e-8, summed through DECIMAL); maxsim is EXACT 64-bit
 * integer arithmetic end-to-end on the 1e-6 quantization grid
 * (sub-vector dots are 8-dim integer sums, max and sum of longs);
 * RRF adds two IEEE doubles 1/(k+rank) in a fixed order — identical
 * bits in any engine.
 */
object Retrieval {

  /** BM25 scores (k1=1.2, b=0.75, Lucene idf) for docs matching any of
    * `terms`: (doc_id, bm25) rounded to 4 decimals — the text_bm25
    * scorer as a reusable leg. */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val dl = tokens.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = tokens
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    bm25FromPostings(tf.join(dl, "doc_id").crossJoin(broadcast(stats)))
  }

  /**
   * The BM25 scoring TAIL over term-filtered postings rows
   * `(doc_id, term, tf, dl, n_docs, avgdl)`: df per term is counted from
   * the filtered postings themselves (exactly the live docs containing
   * the term), then Lucene idf, tf saturation, and the decimal-grid sum.
   * Shared by the batch scorer above and the standing lexical index
   * serve ([[graft.streaming.LexicalIndexMaintenance]]) — one arithmetic
   * path is what makes the maintained serve hash-equal to the batch
   * replay.
   */
  def bm25FromPostings(posts: DataFrame): DataFrame = {
    val df = posts.groupBy("term").agg(count(lit(1)).as("df"))
    posts.join(broadcast(df), "term")
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("tscore",
        col("idf") * col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(round(col("tscore"), 8).cast(DecimalType(20, 8)))
        .cast("double"), 4).as("bm25"))
  }

  /**
   * EXACT PHRASE MATCHING over a positional tokens relation
   * `(doc_id, term, pos)` — the one-shuffle phrase trick: for phrase
   * index i, a token matching the phrase's i-th term votes for the
   * candidate start `base = pos - i`; a start is a match iff ALL m
   * indices voted (count-distinct == m). No m-way self-join: one
   * broadcast join against the tiny (phrase, i, term) table + one
   * (phrase, doc, base)-keyed aggregate whose input is only the tokens
   * matching SOME phrase term. Returns one row per (phrase, doc):
   * `(phrase, doc_id, n_occ, first_pos)` — occurrence count and the
   * 0-based position of the first occurrence.
   *
   * Shared by the batch scan (`text_phrase_search`) and the standing
   * positional index serve ([[graft.streaming.LexicalIndexMaintenance]]
   * `phraseSearch` — where `tokens` is the term-pruned positions fold),
   * so the two are hash-equal by construction.
   */
  def phraseMatches(tokens: DataFrame, phrases: Seq[String]): DataFrame = {
    val spark = tokens.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val phRows = phrases.flatMap { p =>
      val ts = p.split(" ")
      ts.zipWithIndex.map { case (t, i) => Row(p, i, t, ts.length) }
    }
    val ph = spark.createDataFrame(
      spark.sparkContext.parallelize(phRows, 1),
      StructType(Seq(
        StructField("phrase", StringType, nullable = false),
        StructField("i", IntegerType, nullable = false),
        StructField("term", StringType, nullable = false),
        StructField("m", IntegerType, nullable = false))))
    tokens.join(broadcast(ph), "term")
      .groupBy(col("phrase"), col("doc_id"), (col("pos") - col("i")).as("base"),
        col("m"))
      .agg(countDistinct(col("i")).as("k"))
      .where(col("k") === col("m"))
      .groupBy(col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("base")).cast("long").as("first_pos"))
  }

  /** Rank a scored leg into (doc_id, rnk), top `n`, ties by doc_id. */
  def rankLeg(scored: DataFrame, scoreCol: String, n: Int): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
        Window.orderBy(col(scoreCol).desc, col("doc_id"))))
      .where(col("rnk") <= n)
      .select(col("doc_id"), col("rnk"))

  /**
   * Reciprocal-rank fusion of a sparse and a dense leg (each
   * `(doc_id, rnk)` top-N lists): rrf = Σ_leg 1/(k + rank), docs
   * missing from a leg contribute nothing. Returns the fused top
   * `topN`: (doc_id, rrf, srnk, drnk) with 0 marking absence.
   */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int, topN: Int): DataFrame = {
    val s = sparse.select(col("doc_id"), col("rnk").as("srnk"))
    val d = dense.select(col("doc_id"), col("rnk").as("drnk"))
    val fused = s.join(d, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(lit(1.0) / (lit(k) + col("srnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("drnk")), lit(0.0)), 6).as("rrf"),
        coalesce(col("srnk"), lit(0)).cast("long").as("srnk"),
        coalesce(col("drnk"), lit(0)).cast("long").as("drnk"))
    fused
      .withColumn("frnk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .where(col("frnk") <= topN)
      .drop("frnk")
  }

  /** Exact integer dot of two quantized token slices. */
  private def tokenDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** ColBERT-style maxsim between two quantized vectors decomposed into
    * `nTok` contiguous `dim`-wide token slices:
    * Σ_i max_j dot(q_slice_i, d_slice_j) — exact long arithmetic. */
  def maxSimScore(qqv: Column, dqv: Column, nTok: Int, dim: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nTok - 1)), i =>
        array_max(transform(sequence(lit(0), lit(nTok - 1)), j =>
          tokenDot(slice(qqv, i * lit(dim) + lit(1), lit(dim)),
            slice(dqv, j * lit(dim) + lit(1), lit(dim)))))),
      lit(0L), (acc, m) => acc + m)

  /**
   * Late-interaction RERANK of a shortlist — the ColBERT serving shape
   * at scale: candidates come from a cheap single-vector first stage
   * (the standing IVF read), maxsim scores ONLY the shortlist. The
   * shortlist `(query_id, vec_id)` is |Q|·r rows (broadcast both ways);
   * the corpus is scanned once to fetch candidate vectors by id —
   * maxsim's token cross-product never touches a non-candidate row.
   */
  def maxSimRerank(embeddings: DataFrame, shortlist: DataFrame,
      queryIds: Seq[Long], k: Int, nTok: Int = 8, dim: Int = 8): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val q = corpus.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val cand = corpus
      .join(broadcast(shortlist.select(col("query_id"), col("vec_id"))), Seq("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("ms").desc, col("vec_id"))
    cand.join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        maxSimScore(col("qqv"), col("qv"), nTok, dim).as("ms"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id"), col("ms"))
  }

  /**
   * Late-interaction top-k: for each query vector, rank the corpus by
   * maxsim over `nTok` sub-vector tokens (self excluded). One corpus
   * scan, broadcast query side, codegen'd scorer — the exact-scan shape.
   */
  def maxSimTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nTok: Int = 8, dim: Int = 8): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val q = corpus.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("ms").desc, col("vec_id"))
    corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        maxSimScore(col("qqv"), col("qv"), nTok, dim).as("ms"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id"), col("ms"))
  }
}
