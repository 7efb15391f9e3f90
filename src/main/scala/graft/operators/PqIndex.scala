package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) for ANN — the memory-compression half of the
 * FAISS-style toolbox next to [[IvfIndex]]'s list-pruning half: vectors
 * are split into M contiguous subspaces, each subspace gets its own
 * small k-means codebook, and every vector is stored as M single-byte
 * codes. At 100 TB this is THE reason large ANN deployments fit in
 * memory: 64 quantized longs (512 B) become 8 codes (8 B) + one shared
 * 16x8-long codebook per subspace, and query scoring never touches the
 * original vectors — an asymmetric-distance (ADC) scan reads only the
 * code columns and looks the partial dot products up in
 * broadcast-literal tables.
 *
 * Determinism/oracle contract (the r13 discipline: keep every iterative
 * step exact-arithmetic so it stays DuckDB-replayable): sub-codebooks
 * are fit by the SAME integer truncated-mean k-means as the IVF index
 * ([[IvfIndex.fitCentroids]] on each subvector slice — seeds are the
 * ksub lowest vec_ids, every centroid component an exact integer), code
 * assignment is the same |c|^2 - 2<v,c> relative-distance argmin with
 * ties to the lower code, and the ADC dot is an exact integer sum of
 * subspace dot products. The single rounding point is the final
 * cosine-style normalization (reconstructed-norm denominator), rounded
 * to 4 decimals before ranking — the same float discipline as every
 * other scored query.
 *
 * Scale posture: fitting reads the corpus M times over an 8-dim slice
 * (bounded by the fit-sample cap like IVF); encoding is ONE projection
 * pass (M x ksub codegen'd LongArrayDot argmins); the ADC scan is one
 * pass over (vec_id, code_0..code_{M-1}, recon2) — the corpus vectors
 * themselves never move. Composes with the standing-index lifecycle the
 * same way IVF does (the codes table is the persistable artifact).
 */
object PqIndex {

  /** Fit one codebook per subspace: `books(s)(code)(dim)` — exact
    * integer values carried as doubles, like IVF centroids.
    *
    * The M sub-fits are INDEPENDENT k-means problems over slices of the
    * same rows, so they share one Lloyd loop: one deterministic fit
    * sample, one seeds collect, and per iteration ONE assignment+sum job
    * over all subspaces (explode (s, code, subvector), integer sums per
    * (s, code, pos)) instead of M sequential [[IvfIndex.fitCentroids]]
    * loops — M×(iters+1) driver actions become iters+1 (r16 opt round:
    * ~25 actions → 3 at M=8, iters=2; each tiny action paid ~100 ms of
    * planning/scheduling in every PQ (re)fit, and at 100 TB the batched
    * loop reads the fit sample once per iteration instead of M times).
    * Arithmetic is UNCHANGED per subspace — same sample rows (the hash
    * order ignores the slice), same seeds (lowest vec_ids, sliced), same
    * rounded-grid argmin with ties to the lower code, same exact long
    * sums + truncating division — so books are byte-identical to the
    * sequential fit (PqBatchedFitSpec) and every PQ oracle replay holds.
    * ksub above the literal-expression bound falls back to the
    * sequential per-subspace path (the join-path assign). */
  def fitCodebooks(quantized: DataFrame, m: Int, subDim: Int, ksub: Int,
      iters: Int): Array[Array[Array[Double]]] =
    if (ksub > 64)
      (0 until m).map { s =>
        IvfIndex.fitCentroids(
          quantized.select(col("vec_id"),
            slice(col("qv"), s * subDim + 1, subDim).as("qv")),
          ksub, iters)
      }.toArray
    else {
      val fit = quantized.select(col("vec_id"), col("qv"))
        .orderBy(PortableHash.h(col("vec_id").cast("string")), col("vec_id"))
        .limit(1 << 18)
        .persist()
      try {
        val seedRows = fit.orderBy(col("vec_id")).limit(ksub)
          .select(col("qv")).collect()
          .map(_.getSeq[Long](0).map(_.toDouble).toArray)
        var books: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
          seedRows.map(v => v.slice(s * subDim, (s + 1) * subDim)))
        for (_ <- 0 until iters) {
          val subAssigned = (0 until m).map { s =>
            val sv = slice(col("qv"), s * subDim + 1, subDim)
            struct(lit(s).as("s"),
              graft.functions.QuantCodecCols.ivfArgmin(sv, books(s)).as("cluster"),
              sv.as("sv"))
          }
          val sums = fit
            .select(explode(array(subAssigned: _*)).as("a"))
            .select(col("a.s").as("s"), col("a.cluster").as("cluster"),
              posexplode(col("a.sv")).as(Seq("pos", "v")))
            .groupBy(col("s"), col("cluster"), col("pos"))
            .agg(sum(col("v")).as("sum"), count(lit(1)).as("n"))
            .collect()
          val means = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
            .map { case (k, rs) =>
              k -> rs.map(r => r.getInt(2) -> r.getLong(3) / r.getLong(4)).toMap
            }
          books = Array.tabulate(m) { s =>
            books(s).indices.map { c =>
              means.get((s, c)) match {
                case Some(mm) =>
                  Array.tabulate(subDim)(d => mm.getOrElse(d, 0L).toDouble)
                case None => books(s)(c) // empty cluster keeps its seed
              }
            }.toArray
          }
        }
        books
      } finally { fit.unpersist(); () }
    }

  /** Add `code_0..code_{m-1}` columns: per-subspace argmin against the
    * codebook (relative distance, ties to the lower code id) — one
    * projection, no shuffle. All m argmins run in ONE codegen'd kernel
    * ([[graft.functions.PqEncodeCodes]], r17 opt round — the old shape
    * was one array_sort of ksub codeword-literal distance structs PER
    * SUBSPACE, an O(m·ksub·subDim)-node tree Catalyst re-analyzed on
    * every per-batch action; identical argmin/tie arithmetic,
    * QuantCodecSpec). */
  def encode(quantized: DataFrame, books: Array[Array[Array[Double]]],
      subDim: Int): DataFrame = {
    require(books(0)(0).length == subDim,
      s"books have subDim ${books(0)(0).length}, caller claimed $subDim")
    val withArr = quantized.withColumn("_pqc",
      graft.functions.QuantCodecCols.pqEncode(col("qv"), books))
    books.indices.foldLeft(withArr) { (df, s) =>
      df.withColumn(s"code_$s", element_at(col("_pqc"), s + 1))
    }.drop("_pqc")
  }

  /** The m code columns gathered back into one array<int> (cheap
    * attribute gather — the codec kernels take the codes as one array). */
  private def codesArr(m: Int): Column =
    array((0 until m).map(s => col(s"code_$s")): _*)

  /** Squared reconstructed norm: sum over subspaces of |book[code]|^2 —
    * exact integer, computed from the codes alone. */
  private def recon2(books: Array[Array[Array[Double]]]): Column =
    graft.functions.QuantCodecCols.pqRecon2(codesArr(books.length), books)

  /**
   * BUILD the full PQ artifact over a corpus: fitted sub-codebooks + the
   * materialized code table `(vec_id, code_0..code_{m-1}, recon2)` —
   * the expensive step (m sub-k-means + one encode pass). [[AnnIndex.pq]]
   * memoizes/persists the result so the three PQ queries (and warm bench
   * reps) share one build — the same standing-artifact lifecycle as the
   * IVF index.
   */
  /**
   * OPQ-LITE: a variance-balancing DIMENSION PERMUTATION for PQ (the
   * cheap, exactly-replayable member of the OPQ family — Ge et al.,
   * "Optimized Product Quantization", CVPR 2013 learn a full rotation;
   * the permutation special case balances per-subspace energy without
   * any float linear algebra). Dimensions are ranked by integer
   * dispersion n·Σx² − (Σx)² on the e3 sub-grid (exact 64-bit at every
   * gate SF; the coarser grid only affects tie granularity, broken by
   * dimension id) and dealt ROUND-ROBIN into the M subspaces, so no
   * subspace hoards the high-variance dimensions — the failure mode
   * that makes contiguous-slice PQ codebooks waste codewords.
   *
   * Returns dst → src: slot `d` of the permuted vector holds source
   * dimension `perm(d)` (0-based). One aggregate scan + a dims-row
   * bounded collect.
   */
  def dispersionPermutation(embeddings: DataFrame, m: Int,
      dims: Int = 64): Array[Int] = {
    require(m > 0 && dims % m == 0, s"dims ($dims) must be a multiple of m ($m)")
    val stats = embeddings
      .select(posexplode(Similarity.quantize(col("embedding"))).as(Seq("pos", "x")))
      .select(col("pos"), expr("x DIV 1000").as("xk"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("xk")).as("sx"),
        sum(col("xk") * col("xk")).as("sxx"))
      .collect() // dims rows — bounded
    require(stats.length == dims,
      s"corpus vectors have ${stats.length} dims, caller claimed $dims")
    val ranked = stats
      .map(r => (r.getInt(0),
        r.getLong(1) * r.getLong(3) - r.getLong(2) * r.getLong(2)))
      .sortBy { case (pos, d) => (-d, pos) }
    val subDim = dims / m
    val perm = new Array[Int](dims)
    ranked.zipWithIndex.foreach { case ((pos, _), r) =>
      perm((r % m) * subDim + r / m) = pos
    }
    perm
  }

  /** Apply a dst→src dimension permutation to the raw embedding column
    * (elementwise, so it commutes with quantization; norms unchanged). */
  def permuteEmbeddings(embeddings: DataFrame, perm: Array[Int]): DataFrame =
    embeddings.withColumn("embedding",
      transform(array(perm.map(p => lit(p + 1)): _*),
        p => element_at(col("embedding"), p)))

  def buildPq(embeddings: DataFrame, m: Int, ksub: Int,
      iters: Int, dims: Int = 64): (Array[Array[Array[Double]]], DataFrame) = {
    require(m > 0 && dims % m == 0,
      s"dims ($dims) must be a positive multiple of m ($m) — " +
        "subspace slicing needs equal-width subvectors")
    val corpus = Similarity.quantizedWithNorm(embeddings).persist()
    // a dims mismatched with the corpus would make slice() silently yield
    // short/empty subvectors (degenerate codebooks, wrong codes) — fail
    // fast on one sampled row instead; an EMPTY corpus likewise fails
    // here rather than as a degenerate zero-seed fit (same discipline as
    // SqIndex.buildSq)
    val probe = corpus.select(size(col("qv")).as("len")).limit(1).collect()
    require(probe.nonEmpty,
      "corpus is empty — nothing to fit PQ codebooks on (check the filter)")
    require(probe(0).getInt(0) == dims,
      s"corpus vectors have ${probe(0).getInt(0)} dims, caller claimed $dims")
    val subDim = dims / m
    val books = fitCodebooks(corpus.select(col("vec_id"), col("qv")), m, subDim, ksub, iters)
    val codes = encode(corpus, books, subDim)
      .withColumn("recon2", recon2(books))
      .select(col("vec_id") +: col("recon2") +:
        (0 until m).map(s => col(s"code_$s")): _*)
      .localCheckpoint(true) // the compact artifact: codes + recon2 only
    corpus.unpersist()
    (books, codes)
  }

  /**
   * INGEST-path encode: the code rows of one batch against FROZEN
   * codebooks — the PQ twin of [[IvfIndex.assignBatch]]. O(batch): one
   * projection pass (M x ksub broadcast-literal argmins), no shuffle, no
   * refit, no corpus re-scan. Unioned with a standing code table this is
   * byte-equal to encoding the grown corpus against the same books
   * (encoding is per-row), which is the full-rebuild contract the
   * `ann_pq_refresh` oracle replays.
   */
  def encodeBatch(embeddings: DataFrame,
      books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val subDim = books(0)(0).length
    encode(Similarity.quantizedWithNorm(embeddings), books, subDim)
      .withColumn("recon2", recon2(books))
      .select(col("vec_id") +: col("recon2") +:
        (0 until m).map(s => col(s"code_$s")): _*)
  }

  /**
   * ADC approximate top-k SERVED from a standing PQ artifact: score =
   * exact-integer ADC dot (sum of subspace dots against the
   * reconstructed codewords) normalized by query norm x reconstructed
   * vector norm, rounded to 4; rank by (score desc, vec_id). Queries use
   * their FULL vectors (asymmetric — the 'A' in ADC), re-read from the
   * embeddings table with a pushed-down vec_id filter; corpus rows
   * contribute only their codes.
   */
  def adcTopKFrom(books: Array[Array[Array[Double]]], codes: DataFrame,
      embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val m = books.length
    val q = Similarity.quantizedWithNorm(
        embeddings.where(col("vec_id").isin(queryIds: _*)))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("norm").as("qnorm"))
    val adcDot = graft.functions.QuantCodecCols.pqAdcDot(
      col("qqv"), codesArr(m), books)
    val scored = codes
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(adcDot.cast("double") /
          (col("qnorm") * sqrt(col("recon2").cast("double"))), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** One-shot ADC top-k: build + serve + drop (specs/ablations; the
    * query surface serves from the memoized artifact in [[AnnIndex]]). */
  def adcTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2): DataFrame = {
    val (books, codes) = buildPq(embeddings, m, ksub, iters)
    val result = adcTopKFrom(books, codes, embeddings, queryIds, k)
      .localCheckpoint(true)
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(codes)
    result
  }

  /**
   * The SINGLE-TABLE IVFADC layout — the canonical FAISS deployment
   * shape (r14 verdict #3): every vector's PQ codes stored WITH its IVF
   * cluster id, `(vec_id, cluster, recon2, code_0..code_{m-1})`. One
   * corpus-sized join at BUILD time (amortized into the standing
   * artifact, exactly like the index build itself); serving then needs
   * NO corpus-sized join at all — the probe set broadcasts onto the
   * table and unprobed clusters never move (with the durable layer's
   * partition-by-cluster layout, they are never even read).
   */
  def ivfpqTable(assigned: DataFrame, codes: DataFrame): DataFrame =
    assigned.select(col("vec_id"), col("cluster")).join(codes, "vec_id")

  /**
   * IVFADC top-k SERVED from the single standing table: the IVF half
   * prunes (broadcast probes onto `cluster`), the PQ half scores (ADC
   * against broadcast-literal codebooks) — one join, ~nProbe/nLists of
   * the corpus scanned, 8 B of codes read per touched row. Queries use
   * their FULL vectors (asymmetric), re-read from the embeddings table
   * with a pushed-down vec_id filter — same discipline as
   * [[adcTopKFrom]].
   */
  def ivfadcTopKFromTable(centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], table: DataFrame,
      embeddings: DataFrame, queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame = {
    val q = Similarity.quantizedWithNorm(
      embeddings.where(col("vec_id").isin(queryIds: _*)))
    val probes = q
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("norm").as("qnorm"),
        explode(graft.functions.QuantCodecCols.ivfProbeTop(
          col("qv"), centroids, nProbe)).as("cluster"))
    val adcDot = graft.functions.QuantCodecCols.pqAdcDot(
      col("qqv"), codesArr(books.length), books)
    val scored = table
      .join(broadcast(probes), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(adcDot.cast("double") /
          (col("qnorm") * sqrt(col("recon2").cast("double"))), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /**
   * IVFADC + EXACT REFINE (re-rank) — the canonical two-stage FAISS
   * serving shape (IndexIVFPQ + refine, the semantic successor of the
   * reference's rescore-on-top-of-a-compact-sketch pattern,
   * ItemRowRescorerTwoInputStreamOperator.java:158-228): stage 1 builds
   * a SHORTLIST of `shortlist` candidates per query by ADC from the
   * standing cluster-partitioned table (cheap — 8 B of codes per touched
   * row, probe set broadcast, unprobed lists never read); stage 2
   * fetches ONLY the shortlist's raw vectors by id and exact-scores the
   * final top-k. Closes the measured ADC recall gap (≈0.2@10 at these
   * params; refined sits at the IVF-pruning ceiling) while the raw
   * vectors read stays shortlist-sized: the candidate set is
   * |queries| x shortlist rows — always broadcast — so the corpus-side
   * fetch is one broadcast-hash probe of the embeddings scan, never a
   * shuffle.
   *
   * Determinism: shortlist membership ranks the ROUND(4) ADC score with
   * the vec_id tiebreak (same as [[ivfadcTopKFromTable]]); the final
   * ranking uses the ROUND(4) exact cosine + vec_id — both
   * DuckDB-replayable.
   */
  def ivfadcRefinedTopK(centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], table: DataFrame,
      embeddings: DataFrame, queryIds: Seq[Long], k: Int, nProbe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val cand = ivfadcTopKFromTable(centroids, books, table, embeddings,
        queryIds, shortlist, nProbe)
      .select(col("query_id"), col("vec_id"))
    refineExact(cand, embeddings, queryIds, k)
  }

  /** Stage 2 of the refined serve, shared by the raw and residual
    * shortlists: fetch ONLY the candidate pairs' raw vectors (broadcast
    * candidate + query sides — never a shuffle), exact-cosine re-rank,
    * keep k. */
  private def refineExact(cand: DataFrame, embeddings: DataFrame,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = Similarity.quantizedWithNorm(embeddings)
    val q = Similarity.quantizedWithNorm(
        embeddings.where(col("vec_id").isin(queryIds: _*)))
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("norm").as("qnorm"))
    val rescored = corpus
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(Similarity.cosineFromParts(
          Similarity.dotQ(col("qqv"), col("qv")),
          col("qnorm"), col("norm")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    rescored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /** Two-stage refined serve over the RESIDUAL table: residual-ADC
    * shortlist (cleaner than the raw-code shortlist at equal bytes),
    * exact re-rank — same shapes as [[ivfadcRefinedTopK]]. */
  def ivfadcResRefinedTopK(centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], table: DataFrame,
      embeddings: DataFrame, queryIds: Seq[Long], k: Int, nProbe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val cand = ivfadcResTopKFromTable(centroids, books, table, embeddings,
        queryIds, shortlist, nProbe)
      .select(col("query_id"), col("vec_id"))
    refineExact(cand, embeddings, queryIds, k)
  }

  /** Two-artifact IVFADC compose (specs/ablations): stitches the table
    * inline and serves through [[ivfadcTopKFromTable]] — the query
    * surface serves from the MEMOIZED single table in
    * [[AnnIndex.ivfpq]], which pays the stitch join once per corpus. */
  def ivfadcTopKFrom(centroids: Array[Array[Double]], assigned: DataFrame,
      books: Array[Array[Array[Double]]], codes: DataFrame,
      embeddings: DataFrame, queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame =
    ivfadcTopKFromTable(centroids, books, ivfpqTable(assigned, codes),
      embeddings, queryIds, k, nProbe)

  // ------------------------------------------------------------------
  // RESIDUAL-encoded IVFADC — the true FAISS IndexIVFPQ layout: PQ
  // codes quantize the RESIDUAL v - c(v) (the vector minus its coarse
  // IVF centroid), not the raw vector. Residuals have far less energy
  // than raw vectors (the coarse quantizer already explains the
  // between-cluster variance), so the same 8 B/vector budget spends its
  // 16 codewords per subspace on a much smaller ball — the standard
  // reason FAISS IVFADC recall beats flat-PQ recall at equal bytes.
  //
  // Exactness: residual components are long - long (centroids are exact
  // integers), the sub-k-means is the same truncated-mean integer loop,
  // and the reconstructed norm^2 |c + r_hat|^2 = |c|^2 + 2<c,r_hat> +
  // |r_hat|^2 expands into exact integer codeword/centroid dots — so
  // the whole family keeps the one-final-ROUND oracle discipline.
  //
  // Serving stays asymmetric and code-only: score numerator
  // <q, c + r_hat> = <q,c> (per probed cluster, computed on the
  // broadcast probe row) + sum_s <q_s, book_s[code_s]> (the same ADC
  // lookups as the raw path) — the corpus vectors never appear
  // post-build.
  // ------------------------------------------------------------------

  /** Literal per-cluster |c|^2 (exact long) — nLists scalar literals,
    * small at any gate size. */
  private def centN2Lit(centroids: Array[Array[Double]]): Column =
    array(centroids.map(c => lit(c.map(x => { val q = math.round(x); q * q }).sum)): _*)

  /** Residual rows `(vec_id, cluster, qv = v - centroid[cluster])` from
    * an assigned index — one projection (build/ingest path only). The
    * centroid lookup + elementwise subtract run as codegen'd kernels
    * (the old shape was an nLists·dims literal table indexed per row,
    * then an interpreted zip_with lambda). */
  def residuals(assigned: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    assigned.select(col("vec_id"), col("cluster"),
      graft.functions.QuantCodecCols.longArraySub(col("qv"),
        graft.functions.QuantCodecCols.ivfCentroidRow(col("cluster"), centroids))
        .as("qv"))

  /** `2<c, r_hat> + |r_hat|^2` + `|c|^2` — the exact reconstructed
    * norm^2 of `c + r_hat`, from the codes + cluster id alone. */
  private def resRecon2(centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], subDim: Int): Column = {
    val cent = graft.functions.QuantCodecCols.ivfCentroidRow(col("cluster"), centroids)
    val cross = graft.functions.QuantCodecCols.pqAdcDot(
      cent, codesArr(books.length), books)
    element_at(centN2Lit(centroids), col("cluster") + 1) +
      lit(2L) * cross + recon2(books)
  }

  /** Encode residual rows against frozen residual codebooks into the
    * single-table layout `(vec_id, cluster, recon2, code_0..m-1)`. */
  private def resCodeRows(res: DataFrame, centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], subDim: Int): DataFrame =
    encode(res, books, subDim)
      .withColumn("recon2", resRecon2(centroids, books, subDim))
      .select(col("vec_id") +: col("cluster") +: col("recon2") +:
        (0 until books.length).map(s => col(s"code_$s")): _*)

  /**
   * BUILD the residual-IVFADC artifact from an assigned IVF index:
   * sub-codebooks fit on the residuals, every vector's residual encoded,
   * result in the standing single-table layout (same shape as
   * [[ivfpqTable]], directly servable and durable through the same
   * [[AnnIndex.IvfPq]] lifecycle).
   */
  def buildResPq(assigned: DataFrame, centroids: Array[Array[Double]],
      m: Int, ksub: Int, iters: Int, dims: Int = 64)
      : (Array[Array[Array[Double]]], DataFrame) = {
    require(m > 0 && dims % m == 0,
      s"dims ($dims) must be a positive multiple of m ($m)")
    val subDim = dims / m
    val res = residuals(assigned, centroids).persist()
    val probe = res.select(size(col("qv")).as("len")).limit(1).collect()
    require(probe.nonEmpty,
      "corpus is empty — nothing to fit residual codebooks on (check the filter)")
    require(probe(0).getInt(0) == dims,
      s"corpus vectors have ${probe(0).getInt(0)} dims, caller claimed $dims")
    val books = fitCodebooks(res.select(col("vec_id"), col("qv")), m, subDim, ksub, iters)
    val table = resCodeRows(res, centroids, books, subDim).localCheckpoint(true)
    res.unpersist()
    (books, table)
  }

  /** INGEST-path residual encode: one assigned batch against FROZEN
    * centroids + residual codebooks — O(batch), one projection, no
    * shuffle (the residual twin of [[encodeBatch]]). Unioned with the
    * standing table this equals re-encoding the grown corpus against the
    * same frozen artifacts (encoding is per-row). */
  def encodeResBatch(assignedBatch: DataFrame, centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame =
    resCodeRows(residuals(assignedBatch, centroids), centroids, books,
      books(0)(0).length)

  /**
   * Residual-IVFADC top-k SERVED from the standing single table: IVF
   * half prunes (broadcast probes onto `cluster`), residual-PQ half
   * scores — ADC numerator `<q,c> + sum_s <q_s, book_s[code_s]>`, both
   * terms exact integers (the <q,c> term rides the broadcast probe row:
   * one centroid dot per (query, probed list), never per candidate).
   * Same rounding/rank discipline as [[ivfadcTopKFromTable]].
   */
  def ivfadcResTopKFromTable(centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]], table: DataFrame,
      embeddings: DataFrame, queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame = {
    val q = Similarity.quantizedWithNorm(
      embeddings.where(col("vec_id").isin(queryIds: _*)))
    val probes = q
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("norm").as("qnorm"),
        explode(graft.functions.QuantCodecCols.ivfProbeTop(
          col("qv"), centroids, nProbe)).as("cluster"))
      .select(col("query_id"), col("qqv"), col("qnorm"), col("cluster"),
        Similarity.dotQ(col("qqv"),
          graft.functions.QuantCodecCols.ivfCentroidRow(col("cluster"), centroids))
          .as("qcdot"))
    val adcDot = graft.functions.QuantCodecCols.pqAdcDot(
      col("qqv"), codesArr(books.length), books)
    val scored = table
      .join(broadcast(probes), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round((col("qcdot") + adcDot).cast("double") /
          (col("qnorm") * sqrt(col("recon2").cast("double"))), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** The code table in its query-surface shape (codes cast to long). */
  def codeTableFrom(codes: DataFrame, m: Int): DataFrame =
    codes.select(col("vec_id") +:
      (0 until m).map(s => col(s"code_$s").cast("long")) :+
      col("recon2"): _*)

  /** One-shot code table (specs; the query surface uses the memo). */
  def codeTable(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    val (_, codes) = buildPq(embeddings, m, ksub, iters)
    codeTableFrom(codes, m)
  }
}
