package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate nearest neighbor index: deterministic
 * distributed k-means over quantized vectors partitions the corpus into
 * nLists clusters; queries probe only the nProbe nearest clusters.
 *
 * Scale posture: centroids are tiny (nLists x dims doubles) -> always
 * broadcast; assignment is one scan of the corpus per k-means iteration
 * (map-side argmin against broadcast centroids, then a hash agg for the
 * new means); search scans ~nProbe/nLists of the corpus per query. This
 * is the standard IVF-flat layout (FAISS-style) expressed relationally.
 *
 * Determinism: init picks the lowest-vec_id vectors as seeds; every step
 * is integer/double arithmetic over a fixed iteration count — same
 * clusters on any partitioning or cluster size.
 */
object IvfIndex {

  /** Distance discipline (shared by both assignment paths and the codegen
    * kernels in [[graft.functions.QuantCodecCols]]): RELATIVE squared L2
    * between a quantized vector and a centroid — |v-c|^2 = |v|^2 - 2<v,c>
    * + |c|^2, and |v|^2 is constant across centroids, so argmin/sort
    * order only needs |c|^2 - 2<v,c>. Centroids are rounded onto the
    * same e6 integer grid as the vectors so every distance is an exact
    * long. Grid rounding error (<=0.5 on a ~1e6-scale grid) is far below
    * any cluster-boundary distance and keeps every step exactly
    * deterministic. */

  /** Above this many lists, assignment/probing JOIN a broadcast centroid
    * TABLE instead of evaluating the per-row argmin kernel. The kernel
    * path (<= the bound) is one expression node with the centroid grid
    * as a plain JVM array (r17 opt round — it replaced the former
    * O(nLists·dims)-node literal trees whose per-plan analysis cost the
    * r16 sf10 graph cell measured at ~30k nodes compiled per batch); the
    * join path remains the declared posture above the bound, where the
    * broadcast-table + window argmin distributes the rows·nLists
    * candidate work across the cluster. Both paths use the identical
    * integer arithmetic (cn2 - 2<v,c>, ties to the lower cluster id) —
    * byte-equal outputs (IvfJoinPathSpec). */
  private val LiteralCentroidMax = 64

  /** Broadcast (cluster, cv, cn2) table of the rounded centroids. */
  private def centroidTable(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): DataFrame = {
    val rows = centroids.zipWithIndex.map { case (cv, i) =>
      val cq = cv.map(math.round)
      (i, cq.toSeq, cq.map(x => x * x).sum)
    }
    spark.createDataFrame(rows.toSeq).toDF("cluster", "cv", "cn2")
  }

  /** Cluster assignment for each vector against the given centroids.
    * Literal path: argmin via array_sort of (dist, idx) structs —
    * expression size LINEAR in nLists (a reduce of nested when()s
    * duplicates both branch subtrees per step: 2^nLists nodes, which
    * hangs Catalyst analysis). Join path (above [[LiteralCentroidMax]]):
    * broadcast centroid table, window argmin per vec_id. */
  def assign(quantized: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    if (centroids.length <= LiteralCentroidMax) {
      quantized.withColumn("cluster",
        graft.functions.QuantCodecCols.ivfArgmin(col("qv"), centroids))
    } else {
      val spark = quantized.sparkSession
      val cols = quantized.columns
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("_cd"), col("_cc"))
      quantized
        .crossJoin(broadcast(centroidTable(spark, centroids)
          .select(col("cluster").as("_cc"), col("cv").as("_cv"),
            col("cn2").as("_cn2"))))
        .withColumn("_cd", col("_cn2") - lit(2L) * Similarity.dotQ(col("qv"), col("_cv")))
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(cols.map(col) :+ col("_cc").as("cluster"): _*)
    }

  /** Deterministic k-means: seeds = nLists lowest vec_ids; `iters` fixed
    * Lloyd iterations (assignment scan + hash-agg mean per iteration).
    *
    * The fit runs on a bounded deterministic sample (the `maxFitRows`
    * lowest portable-hash keys — a total order independent of engine and
    * partitioning), so fit cost is independent of corpus size; the final
    * ASSIGNMENT still covers the full corpus. Below the cap the sample is
    * the whole corpus, so small-scale results are bit-identical. */
  def fitCentroids(quantized: DataFrame, nLists: Int, iters: Int,
      maxFitRows: Int = 1 << 18): Array[Array[Double]] = {
    val fit = quantized
      .orderBy(PortableHash.h(col("vec_id").cast("string")), col("vec_id"))
      .limit(maxFitRows)
      .persist()
    try fitCentroidsFull(fit, nLists, iters)
    finally { fit.unpersist(); () }
  }

  private def fitCentroidsFull(quantized: DataFrame, nLists: Int, iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = quantized
      .orderBy(col("vec_id")).limit(nLists)
      .select(col("qv")).collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toArray)
    for (_ <- 0 until iters) {
      val assigned = assign(quantized, centroids)
      // INTEGER means (r13, corrected r14): exact long sums + a
      // driver-side TRUNCATING long division — the one floating-point
      // step (avg of longs) whose summation order was engine-specific,
      // i.e. the only thing that kept the IVF index from being
      // cross-engine replayable. On the e6 quantization grid the
      // truncated mean is within 1e-6 of the true mean in vector units —
      // far below any cluster-boundary distance — while every centroid
      // component stays an exact integer. r14 correction: DuckDB's
      // integer `//` TRUNCATES TOWARD ZERO (-7 // 2 = -3, measured), it
      // does not floor; r13's Math.floorDiv was off by one on negative
      // sums — invisible in every IVF output (a +-1e-6 centroid shift
      // flips no assignment and no round-4 cosine) but exposed the
      // moment PQ's recon2 put raw centroid values on the query
      // surface. Plain Java long division IS the exact DuckDB mirror.
      val means = assigned
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cluster"))
        .agg(map_from_arrays(collect_list(col("pos")),
          collect_list(struct(col("s"), col("n")))).as("dims"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getMap[Int, org.apache.spark.sql.Row](1).map {
            case (d, sn) => d -> sn.getLong(0) / sn.getLong(1)
          })
        .toMap
      centroids = centroids.indices.map { c =>
        means.get(c) match {
          case Some(m) => Array.tabulate(centroids(c).length)(d => m.getOrElse(d, 0L).toDouble)
          case None => centroids(c) // empty cluster keeps its seed
        }
      }.toArray
    }
    centroids
  }

  /**
   * BUILD the full IVF index over a corpus: fitted centroids + the
   * materialized cluster assignment `(vec_id, qv, norm, cluster)` — the
   * inverted-file layout itself. This is the expensive, corpus-sized
   * step (iters+1 scans); [[AnnIndex]] memoizes/persists its result so
   * queries serve from a STANDING index instead of rebuilding.
   */
  def buildIndex(embeddings: DataFrame, nLists: Int, iters: Int): (Array[Array[Double]], DataFrame) = {
    // quantization is scanned 2x per k-means iteration plus once in the
    // final assignment — cache it once (vec_id + 64 longs + norm: tiny
    // per row)
    val corpus = Similarity.quantizedWithNorm(embeddings).persist()
    val centroids = fitCentroids(corpus.select(col("vec_id"), col("qv")), nLists, iters)
    val indexed = assign(corpus, centroids)
      .select(col("vec_id"), col("qv"), col("norm"), col("cluster"))
      .localCheckpoint(true)
    corpus.unpersist()
    (centroids, indexed)
  }

  /** Assign a (typically small) embedding batch against STANDING
    * centroids — the O(batch) ingest-refresh step: no refit, one scan of
    * the batch against broadcast-literal centroids. Output rows have the
    * index layout `(vec_id, qv, norm, cluster)`. */
  def assignBatch(embeddings: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    assign(Similarity.quantizedWithNorm(embeddings), centroids)
      .select(col("vec_id"), col("qv"), col("norm"), col("cluster"))

  /**
   * SERVE approximate top-k from a standing index: probe the nProbe
   * nearest clusters per query, exact cosine within the probed lists.
   * `indexed` must have the [[buildIndex]] layout. Only the probed
   * clusters' rows are scanned (with the durable parquet layout
   * partitioned by cluster, the broadcast probe join prunes partitions
   * dynamically — the real IVF read shape).
   */
  def topKFrom(centroids: Array[Array[Double]], indexed: DataFrame,
      queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame = {
    val scored = scoredInLists(centroids, indexed,
      indexed.where(col("vec_id").isin(queryIds: _*)), nProbe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /** Probe rows for a query-side relation in index layout: one
    * (query_id, qqv, qnorm, cluster) row per (query, probed list) — the
    * nProbe nearest centroids per query, argmin'd against the broadcast
    * centroid literals exactly as [[assign]] does. */
  private def probesFor(centroids: Array[Array[Double]], qAssigned: DataFrame,
      nProbe: Int): DataFrame =
    if (centroids.length <= LiteralCentroidMax) {
      qAssigned
        .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
          col("norm").as("qnorm"),
          posexplode(graft.functions.QuantCodecCols.ivfProbeTop(
            col("qv"), centroids, nProbe)).as(Seq("pos", "cluster")))
        .select(col("query_id"), col("qqv"), col("qnorm"),
          (col("pos") + 1).as("prn"), col("cluster"))
    } else {
      // join path (see LiteralCentroidMax): broadcast centroid table,
      // per-query rank <= nProbe — identical (d, c) order, O(1) plan
      val spark = qAssigned.sparkSession
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("_cd"), col("_cc"))
      qAssigned
        .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
          col("norm").as("qnorm"))
        .crossJoin(broadcast(centroidTable(spark, centroids)
          .select(col("cluster").as("_cc"), col("cv").as("_cv"),
            col("cn2").as("_cn2"))))
        .withColumn("_cd", col("_cn2") - lit(2L) * Similarity.dotQ(col("qqv"), col("_cv")))
        .withColumn("prn", row_number().over(w))
        .where(col("prn") <= nProbe)
        .select(col("query_id"), col("qqv"), col("qnorm"), col("prn"),
          col("_cc").as("cluster"))
    }

  /** Exact cosine of every (query, candidate) pair inside the probed
    * lists (self excluded) — the shared scoring core of every serve
    * shape. With `broadcastProbes` (the default) the probe side —
    * |Q|·nProbe rows of (id, vec, norm) — broadcasts onto the standing
    * lists: right for literal-id serves and predicate serves with small
    * |Q|. At |Q| ~ corpus (full kNN-graph construction) the probe side
    * is itself data-sized, so callers pass false and the plan becomes a
    * shuffled HASH join on `cluster` (hinted: neither side is sorted by
    * cluster, a sort-merge would pay two wasted sorts). Keeps `cluster`
    * so callers can pre-cut per-(query, list); under the shuffled join
    * that pre-cut inherits hash(cluster) and adds no exchange. */
  private def scoredInLists(centroids: Array[Array[Double]], indexed: DataFrame,
      qAssigned: DataFrame, nProbe: Int,
      broadcastProbes: Boolean = true, selfExclude: Boolean = true): DataFrame = {
    val probes = probesFor(centroids, qAssigned, nProbe)
    // non-broadcast regime: hash-build from the CORPUS side — at
    // data-sized |Q| the probe side is |Q|·nProbe rows (4·N for the full
    // kNN graph), so building the per-partition hash map from the
    // inverted lists is the bounded choice
    (if (broadcastProbes) indexed else indexed.hint("shuffle_hash"))
      .join(if (broadcastProbes) broadcast(probes) else probes,
        Seq("cluster"))
      .where(if (selfExclude) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("cluster"), col("prn"), col("query_id"), col("vec_id"),
        round(Similarity.cosineFromParts(
          Similarity.dotQ(col("qqv"), col("qv")), col("qnorm"), col("norm")), 4).as("cos"))
  }

  /**
   * Batched kNN JOIN from a standing index: approximate top-k neighbors
   * for EVERY row of a query-side RELATION (corpus members selected by
   * `queryPred`) in ONE declarative plan — the realistic retrieval shape
   * at 100 TB (|Q| ~ millions: kNN-graph construction, SemDeDup-style
   * semantic curation, hard-negative mining), vs [[topKFrom]]'s literal
   * id-list serve.
   *
   * Scale posture: the probe side is |Q|·nProbe rows of (id, qv, norm,
   * cluster). Small |Q| broadcasts it and the inverted lists are scanned
   * in place (partition-pruned under the durable cluster-partitioned
   * layout). At |Q| ~ corpus the same plan degrades to a shuffled join
   * on `cluster`, whose parallelism is nLists — which is why nLists must
   * follow the ~sqrt(N) sizing rule at scale: the join key cardinality
   * then tracks the executor count AND per-list candidate work stays
   * ~sqrt(N). Candidates are pre-cut to k per (query, list) BEFORE the
   * global top-k, so the final top-k window moves |Q|·nProbe·k rows
   * instead of |Q|·list-size (both windows additionally get
   * WindowGroupLimit's map-side partial pruning — every exchange here
   * moves k-capped rows, never raw candidate lists). In the
   * shuffled-join regime the pre-cut is shuffle-FREE: hash(cluster)
   * already clusters (query_id, cluster), so only k-capped survivors
   * ever re-shuffle; in the broadcast regime its exchange is k-pruned
   * and net-neutral.
   */
  def knnJoinFrom(centroids: Array[Array[Double]], indexed: DataFrame,
      queryPred: Column, k: Int, nProbe: Int,
      broadcastProbes: Boolean = true): DataFrame =
    knnJoinAssignedFrom(centroids, indexed, indexed.where(queryPred), k,
      nProbe, broadcastProbes)

  /** [[knnJoinFrom]] with the query side provided DIRECTLY in index
    * layout `(vec_id, qv, norm, ...)` instead of as a predicate over the
    * index — the streaming kNN-graph maintenance feeds the freshly
    * assigned ingest batch here (it is part of the as-of index but far
    * cheaper to hand over than to re-select by id). */
  def knnJoinAssignedFrom(centroids: Array[Array[Double]], indexed: DataFrame,
      qAssigned: DataFrame, k: Int, nProbe: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    val scored = scoredInLists(centroids, indexed, qAssigned,
      nProbe, broadcastProbes)
    val perList = Window.partitionBy(col("query_id"), col("cluster"))
      .orderBy(col("cos").desc, col("vec_id"))
    val precut = scored
      .withColumn("lrnk", row_number().over(perList))
      .where(col("lrnk") <= k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    precut
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /** The nProbe probed lists per vector of `assigned` (index layout), as
    * a `(node, cluster, qv, norm)` relation — the standing REVERSE-EDGE
    * ROUTING TABLE of the incremental kNN-graph maintenance: a new
    * vector landing in cluster c is a candidate for exactly the nodes
    * whose probe set contains c. Probe sets are static under frozen
    * centroids, so this is materialized once per ingest batch. */
  def probePairs(centroids: Array[Array[Double]], assigned: DataFrame,
      nProbe: Int): DataFrame =
    probesFor(centroids, assigned, nProbe)
      .select(col("query_id").as("node"), col("cluster"),
        col("qqv").as("qv"), col("qnorm").as("norm"))

  /**
   * kNN JOIN for EXTERNAL query vectors — the true retrieval shape:
   * `queries` is a `(query_id, embedding)` relation whose vectors are
   * NOT corpus members (a fresh batch, another table, user queries), so
   * there is no stored assignment to reuse and no self to exclude. Each
   * query is quantized, probe-assigned against the broadcast centroid
   * literals (the same O(batch) scan as [[assignBatch]]) and joined into
   * the standing lists — identical plan posture to [[knnJoinFrom]]
   * (broadcast at small |Q|, shuffle-hash on `cluster` at data-sized
   * |Q|, per-(query, list) pre-cut).
   */
  def knnJoinExternalFrom(centroids: Array[Array[Double]], indexed: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    val q = Similarity.quantizedWithNorm(
      queries.select(col("query_id").as("vec_id"), col("embedding")))
    val scored = scoredInLists(centroids, indexed, q, nProbe,
      broadcastProbes, selfExclude = false)
    val perList = Window.partitionBy(col("query_id"), col("cluster"))
      .orderBy(col("cos").desc, col("vec_id"))
    val precut = scored
      .withColumn("lrnk", row_number().over(perList))
      .where(col("lrnk") <= k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    precut
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /** Per-cluster probe-visit counts for a query side in index layout —
    * the analytic half of the kNN-join cost model (candidates scored =
    * Σ_c visits(c)·|c|). Measurement-main helper: one tiny aggregate
    * over |Q|·nProbe probe rows, never the joined candidates. */
  def probeVisitCounts(centroids: Array[Array[Double]], qAssigned: DataFrame,
      nProbe: Int): Array[(Int, Long)] =
    probesFor(centroids, qAssigned, nProbe)
      .groupBy(col("cluster")).agg(count(lit(1)).as("visits"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))

  /** RADIUS (range) search from a standing index: every probed-list
    * neighbor with cosine >= minCos, capped at `cap` rows per query in
    * deterministic rank order so dense neighborhoods can't blow up the
    * result relation — the epsilon-ball companion of [[topKFrom]]. */
  def radiusFrom(centroids: Array[Array[Double]], indexed: DataFrame,
      queryIds: Seq[Long], minCos: Double, nProbe: Int, cap: Int): DataFrame = {
    val scored = scoredInLists(centroids, indexed,
      indexed.where(col("vec_id").isin(queryIds: _*)), nProbe)
      .where(col("cos") >= minCos)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= cap)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /** Serve-time FILTERED top-k (the FAISS IDSelector shape): candidates
    * are restricted by `candPred` INSIDE the probed lists BEFORE ranking
    * — pre-filter semantics, so k survivors are returned whenever the
    * probed lists hold k matches — from the UNFILTERED standing index.
    * No per-predicate index build: the predicate rides the inverted-list
    * scan, exactly where a metadata pushdown lands under the durable
    * cluster-partitioned layout. (Contrast [[AnnIndex.ivfFiltered]],
    * which BUILDS a dedicated index over a corpus subset.) */
  def topKFromFiltered(centroids: Array[Array[Double]], indexed: DataFrame,
      queryIds: Seq[Long], k: Int, nProbe: Int, candPred: Column): DataFrame = {
    val scored = scoredInLists(centroids, indexed.where(candPred),
      indexed.where(col("vec_id").isin(queryIds: _*)), nProbe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /**
   * nProbe recall SWEEP — the tuning signal a deployment reads before
   * fixing the probe count: recall@k at several nProbe settings, all
   * from ONE standing artifact and one probe assignment. Probe rank
   * (`prn`, the 1-based nearness order of each probed list) rides the
   * scored rows, so nProbe=n's candidate set is exactly `prn <= n` —
   * the configs are NESTED rank-filters over the widest scan, each
   * provably identical to a [[topKFrom]] serve at that nProbe (same
   * ordering, same tie-break). The exact reference ranking comes from
   * the index's own rows (the index IS the corpus + norms), so no extra
   * table scan. Output: one row per nProbe (n_probe, n_exact, n_hit,
   * recall).
   */
  def probeSweep(centroids: Array[Array[Double]], indexed: DataFrame,
      queryIds: Seq[Long], k: Int, nProbes: Seq[Int]): DataFrame = {
    val qAssigned = indexed.where(col("vec_id").isin(queryIds: _*))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    // materialize the widest scored set and the exact reference ONCE —
    // the per-config branches are rank-filters over these, so the index
    // really is scanned once, not once per config (both are |Q|-bounded:
    // |Q|·nProbe·list rows and |Q|·k rows)
    val scored = scoredInLists(centroids, indexed, qAssigned, nProbes.max)
      .localCheckpoint(true)
    val exact = indexed
      .join(broadcast(qAssigned.select(col("vec_id").as("query_id"),
        col("qv").as("qqv"), col("norm").as("qnorm"))),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(Similarity.cosineFromParts(
          Similarity.dotQ(col("qqv"), col("qv")), col("qnorm"), col("norm")), 4).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"))
      .localCheckpoint(true)
    val out = nProbes.sorted.map { n =>
      val hits = scored.where(col("prn") <= n)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= k)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      exact.join(hits, Seq("query_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(lit(n).as("n_probe"), col("n_exact"), col("n_hit"),
          round(col("n_hit") * lit(1.0) / col("n_exact"), 4).as("recall"))
    }.reduce(_ union _).localCheckpoint(true) // |nProbes| rows
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(scored)
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(exact)
    out
  }

  /** Operational health report of a standing index — the signal that
    * triggers refit or re-sizing before serve latency degrades: list
    * population, size extremes, and the imbalance factor
    * max-list / mean-list (1.0 = perfectly balanced; serve cost on the
    * hottest probe scales with it). One tiny aggregate over the
    * assignment, no vector arithmetic. */
  def indexStats(centroids: Array[Array[Double]], indexed: DataFrame): DataFrame =
    indexed.groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_nonempty"),
        sum(col("sz")).as("n_vectors"),
        min(col("sz")).as("min_sz"), max(col("sz")).as("max_sz"),
        round(max(col("sz")) * lit(1.0) * lit(centroids.length) / sum(col("sz")), 4)
          .as("imbalance"))
      .withColumn("n_lists", lit(centroids.length))

  /**
   * MIPS on the IVF path via the NORM-AUGMENTATION reduction (the
   * standard MIPS→cosine transform, implemented rather than footnoted):
   * every corpus vector is extended with one extra coordinate
   * a = round(sqrt(maxN2 − |v|²)), making every augmented norm ≈ the
   * constant sqrt(maxN2); queries are extended with 0, so the augmented
   * dot IS the raw dot and cosine ordering in augmented space is
   * monotone in the raw inner product. k-means lists are fit over the
   * AUGMENTED vectors (the geometry the probes must prune), candidates
   * are scored by the EXACT integer raw dot (query's extra coordinate
   * is 0 — `LongArrayDot` returns `<q,v>` untouched), so the surface
   * stays bit-exact like [[Similarity.bruteForceTopKDot]], just probed.
   * The augmentation is integer arithmetic end to end (exact long n2,
   * IEEE sqrt + half-away-from-zero round on both engines), so the
   * whole index replays in DuckDB.
   */
  def buildMipsIndex(embeddings: DataFrame, nLists: Int,
      iters: Int): (Array[Array[Double]], DataFrame) = {
    val base = Similarity.quantizedWithNorm(embeddings)
      .select(col("vec_id"), col("qv"),
        Similarity.dotQ(col("qv"), col("qv")).as("n2"))
      .persist()
    try {
      // bounded driver fetch: ONE scalar (the max squared norm)
      val maxN2 = base.agg(max(col("n2"))).collect()(0).getLong(0)
      val corpus = base.select(col("vec_id"),
          concat(col("qv"), array(
            round(sqrt((lit(maxN2) - col("n2")).cast("double"))).cast("long")))
            .as("qv"))
        .select(col("vec_id"), col("qv"),
          sqrt(Similarity.dotQ(col("qv"), col("qv")).cast("double")).as("norm"))
        .persist()
      val centroids = fitCentroids(corpus.select(col("vec_id"), col("qv")), nLists, iters)
      val indexed = assign(corpus, centroids)
        .select(col("vec_id"), col("qv"), col("norm"), col("cluster"))
        .localCheckpoint(true)
      corpus.unpersist()
      (centroids, indexed)
    } finally { base.unpersist(); () }
  }

  /** Serve MIPS top-k from a STANDING augmented index ([[buildMipsIndex]]
    * layout): the query's own stored augmentation is zeroed ([q, 0], so
    * the scored dot IS the raw `<q, v>`), probes rank in the augmented
    * geometry, candidates score by the exact integer raw dot. */
  def mipsTopKFrom(centroids: Array[Array[Double]], indexed: DataFrame,
      queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame = {
    val q0 = indexed.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"),
        concat(slice(col("qv"), lit(1), size(col("qv")) - 1), array(lit(0L)))
          .as("qqv"))
    val probes = q0
      .select(col("query_id"), col("qqv"),
        explode(graft.functions.QuantCodecCols.ivfProbeTop(
          col("qqv"), centroids, nProbe)).as("cluster"))
    val scored = indexed
      .join(broadcast(probes), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.dotQ(col("qqv"), col("qv")).as("dot"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("dot"))
  }

  /** One-shot MIPS-IVF top-k (build + serve + drop) — spec/ablation
    * convenience; the query surface serves from the memoized standing
    * index ([[AnnIndex.mipsIvf]]). */
  def mipsIvfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nLists: Int, nProbe: Int, iters: Int = 3): DataFrame = {
    val (centroids, indexed) = buildMipsIndex(embeddings, nLists, iters)
    val result = mipsTopKFrom(centroids, indexed, queryIds, k, nProbe)
      .localCheckpoint(true) // tiny (|queries| x k rows); lets the index go
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(indexed)
    result
  }

  /**
   * One-shot IVF top-k: build + serve + drop the index. Kept for callers
   * that genuinely want a throwaway index (specs, ablations); the query
   * surface serves from the memoized standing index in [[AnnIndex]].
   */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nLists: Int, nProbe: Int, iters: Int = 3): DataFrame = {
    val (centroids, indexed) = buildIndex(embeddings, nLists, iters)
    val result = topKFrom(centroids, indexed, queryIds, k, nProbe)
      .localCheckpoint(true) // tiny (|queries| x k rows); lets the index go
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(indexed)
    result
  }
}
