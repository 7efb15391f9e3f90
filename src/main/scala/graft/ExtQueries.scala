package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.operators.PortableHash._

/**
 * Training-data-pipeline operator queries (dedup / similarity / text /
 * multimodal) + their DuckDB oracles. The hash-family oracle SQL is
 * GENERATED from the same constants as the Spark side (PortableHash), so
 * the two implementations cannot drift.
 */
object ExtQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  private[graft] val AnnQueries: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir)).orderBy(col("text_hash"))),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Dedup.ngramShingles(docs(s, dir), 3), 0.1)
        .orderBy(col("doc_a"), col("doc_b"))),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashNearDups(docs(s, dir), 0.9)
        .orderBy(col("doc_a"), col("doc_b"))),

    "dedup_simhash" -> ((s, dir) =>
      DedupIndex.simhashPairs(s, dir, 3)
        .orderBy(col("doc_a"), col("doc_b"))),

    // Embedding near-dup, HIGH-RECALL banded configuration (4 bands of 4
    // planes vs dedup_embedding_lsh's 2): candidates come from banded
    // sign-random-projection buckets — an equi-join on (band, bucket), so
    // corpus² never materializes. The oracle mirrors the banding from the
    // same literal sign constants. The exact quadratic verifier
    // (Dedup.embeddingNearDups) is test-side only (ExtOperatorsSpec
    // recall measurement), never on the query surface: an exact cosine
    // join at threshold 0.30 is Ω(N²) and has no 100 TB plan.
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDupsLsh(embs(s, dir), 0.30, nBands = 4)
        .orderBy(col("vec_a"), col("vec_b"))),

    "ann_topk_exact" -> ((s, dir) =>
      Similarity.bruteForceTopK(embs(s, dir), AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk"))),

    // LSH ANN is deterministic end-to-end (fixed hyperplane signs), so it
    // IS fully oracled: the DuckDB oracle mirrors bucket assignment,
    // multi-probe expansion, scoring and ranking from the same literal
    // sign constants (generated below — the two sides cannot drift).
    "ann_topk_lsh" -> ((s, dir) =>
      Similarity.lshTopK(embs(s, dir), AnnQueries, 10, dims = 64, nPlanes = 4)
        .orderBy(col("query_id"), col("rnk"))),

    // IVF ANN (k-means inverted lists): ORACLED since r13 — the integer
    // truncated-mean made every k-means step exact, so the DuckDB oracle
    // replays the whole index (seeds, Lloyd iterations, assignment,
    // probe ranking, in-list cosine) bit-for-bit; recall additionally
    // measured in ExtOperatorsSpec. Since r14 this SERVES FROM THE
    // STANDING INDEX (graft.operators.AnnIndex): the first caller per
    // corpus fingerprint pays the k-means build, every later call —
    // including ann_ivf_sound below and warm bench reps — probes the
    // memoized (or durable) index. Same result by construction.
    "ann_topk_ivf" -> ((s, dir) =>
      AnnIndex.topK(AnnIndex.ivf(s, dir, 16, 3), AnnQueries, 10, nProbe = 4)
        .orderBy(col("query_id"), col("rnk"))),

    // IVF soundness harness (oracled): every returned (query, id, score)
    // must carry the EXACT cosine of that pair, ranks must be contiguous
    // from 1, and the rank-r score can never beat the exact rank-r score.
    // The oracle states the invariant (all-true per query); the Spark
    // side MEASURES it by rejoining the IVF output against the corpus
    // and the exact ranking — turning the rows-only approx query into a
    // checkable one.
    "ann_ivf_sound" -> ((s, dir) => {
      val ivf = AnnIndex.topK(AnnIndex.ivf(s, dir, 16, 3), AnnQueries, 10, nProbe = 4)
      val corpus = Similarity.quantizedWithNorm(embs(s, dir))
      val qSide = corpus.select(col("vec_id").as("query_id"),
        col("qv").as("qqv"), col("norm").as("qnorm"))
      val exactPair = ivf
        .join(broadcast(qSide), "query_id")
        .join(corpus, "vec_id")
        .select(col("query_id"), col("rnk"), col("cos"),
          round(Similarity.cosineFromParts(
            Similarity.dotQ(col("qqv"), col("qv")), col("qnorm"), col("norm")), 4).as("excos"))
      val exactTop = Similarity.bruteForceTopK(embs(s, dir), AnnQueries, 10)
        .select(col("query_id"), col("rnk"), col("cos").as("best_cos"))
      exactPair.join(broadcast(exactTop), Seq("query_id", "rnk"))
        .groupBy(col("query_id"))
        .agg(
          bool_and(col("cos") === col("excos")).as("scores_exact"),
          (max(col("rnk")) === count(lit(1)) && min(col("rnk")) === lit(1) &&
            count(col("rnk")) === countDistinct(col("rnk"))).as("ranks_ok"),
          bool_and(col("cos") <= col("best_cos")).as("bounded_by_exact"))
        .orderBy(col("query_id"))
    }),

    // embedding near-dup at scale (oracled): banded sign-projection
    // buckets -> exact verify inside buckets only. The oracle mirrors
    // the band/bucket computation from the same sign constants, so the
    // emitted pair set hash-matches exactly; recall vs the quadratic
    // verifier is measured in ExtOperatorsSpec.
    "dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupsLsh(embs(s, dir), 0.30)
        .orderBy(col("vec_a"), col("vec_b"))),

    "text_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(docs(s, dir)).orderBy(col("doc_id"))),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScores(docs(s, dir)).orderBy(col("doc_id"))),

    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir)).orderBy(col("doc_id"))),

    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(docs(s, dir)).orderBy(col("doc_id"))),

    "media_decode_stub" -> ((s, dir) =>
      Multimodal.mediaFeatures(s, dir).orderBy(col("doc_id"))),

    // as-of join composed from existing ops (brief's preference (a)): per
    // event, the latest order of that user at or before the event date;
    // deterministic tiebreak (latest date, then highest orderkey)
    "join_asof" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("ed"))
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ed"),
          "left_outer")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        // coalesce: a single NULL turns the oracle's pandas int column
        // into float64 ("123.0" vs 123 in the value hash)
        .select(col("event_id"), col("user_id"),
          coalesce(col("o_orderkey"), lit(-1L)).as("asof_order"),
          coalesce(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("none")).as("asof_date"))
        .orderBy(col("event_id"))
    }),

    // range (theta) join against a tiny tier table -> broadcast
    // nested-loop join, the non-equi join physical path
    "join_range" -> ((s, dir) => {
      val tiers = s.createDataFrame(Seq(
        ("small", 0.0, 50000.0),
        ("medium", 50000.0, 150000.0),
        ("large", 150000.0, 1e9))).toDF("tier", "lo", "hi")
      Tables.table(s, dir, "orders")
        .join(broadcast(tiers),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double").as("total"))
        .orderBy(col("tier"))
    }),

    // exact interpolated percentiles (sorts within group - the exact
    // form; approx_percentile is the sketch variant, see approx_distinct)
    "percentile_agg" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
        .orderBy(col("o_orderpriority"))),

    // HLL++ distinct-count sketch. The sketch VALUE is engine-specific
    // (DuckDB's HLL differs), so the oracle-checkable output is the
    // sketch's CONTRACT: the exact distinct count, plus a flag asserting
    // the sketch landed within 5x its configured rsd (0.01 -> 5% bound,
    // ~5 sigma; ExtOperatorsSpec keeps the tighter statistical check).
    // One pass computes both — the exact side is itself a real query.
    "approx_distinct" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_orders"), col("n"),
          when(abs(col("approx_orders") - col("exact_orders"))
            <= col("exact_orders") * 0.05, 1).otherwise(0).as("within_5pct"))
        .orderBy(col("l_returnflag"))),

    // wider string-function surface
    "scalar_string2" -> ((s, dir) =>
      Tables.table(s, dir, "customer")
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
          reverse(col("c_name")).as("rev"),
          repeat(lit("-"), 3).as("dashes"),
          instr(col("c_name"), "#").as("hash_pos"))
        .orderBy(col("c_custkey"))),

    // CUBE over two dims (rollup's sibling; reference has neither)
    "cube_agg" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
        .select(col("gid"), col("l_returnflag"), col("l_linestatus"), col("n"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    // pivot: event counts per user pivoted by event_type (oracle via
    // conditional aggregation — engine-portable form of PIVOT)
    "pivot_agg" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot(col("event_type"), types)
        .agg(count(lit(1)))
        .na.fill(0, types)
        .orderBy(col("user_id"))
    }),

    // null-handling scalars: coalesce / nullif / nvl
    "scalar_null" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_c"),
          nvl(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("urgent")).as("prio_c"),
          when(col("o_orderpriority").isNull, 0)
            .otherwise(length(col("o_orderpriority"))).as("plen"))
        .orderBy(col("o_orderkey"))),

    // sliding event-time windows (2-day window, 1-day slide): each event
    // lands in 2 windows — the window shape the reference lacks (#10 is
    // tumbling-only) but Spark's window() provides
    "windowed_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("wstart"),
          col("event_type"), col("n"))
        .orderBy(col("wstart"), col("event_type"))),

    // session windows per user (30-min inactivity gap): gap-based
    // sessionization, oracle'd via the classic lag/cumsum SQL form
    "windowed_session" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"))
        .orderBy(col("user_id"))),

    // TPC-H Q5-shaped 5-way join: region -> nation -> customer/supplier ->
    // orders -> lineitem with co-located supplier/customer nation predicate
    "q5_multijoin" -> ((s, dir) => {
      val r = Tables.table(s, dir, "region")
      val n = Tables.table(s, dir, "nation")
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
      val l = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum((col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(20, 4)) *
            (lit(BigDecimal(1)).cast(org.apache.spark.sql.types.DecimalType(20, 4)) -
              col("l_discount").cast(org.apache.spark.sql.types.DecimalType(20, 4)))))
            .cast(org.apache.spark.sql.types.DecimalType(38, 2))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // per-group top-K via the typed bounded-heap UDAF (TopKAggregator,
    // O(K) mergeable state — the streaming-safe form of #14); same
    // semantics and oracle as the window-rank form in group_topk.
    "group_topk_heap" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAggregator(3),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.functions.TopKEntry]())
      val cnt = Tables.table(s, dir, "events")
        .select(col("user_id"), get_json_object(col("props"), "$.k").cast("int").as("item"))
        .groupBy(col("user_id"), col("item")).agg(count(lit(1)).as("n"))
      cnt.groupBy(col("user_id"))
        .agg(topk(col("item"), col("n").cast("double")).as("tk"))
        .select(col("user_id"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("user_id"), (col("pos") + 1).as("rnk"),
          col("e.value").as("item"), col("e.score").cast("long").as("n"))
        .orderBy(col("user_id"), col("rnk"))
    }),

    // salted skew join: scatter hot keys across `salt` replicas of the
    // small side — output must equal the plain join (same oracle shape).
    "salted_join" -> ((s, dir) => {
      val l = Tables.table(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      val r = Tables.table(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      SkewJoin.saltedJoin(l, r, "l_suppkey", salt = 8)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double").as("qty"))
        .orderBy(col("s_name"))
    }),

    // array scalar-function surface over the documents words
    "scalar_array" -> ((s, dir) => {
      val w = split(col("text"), " ")
      docs(s, dir).select(
        col("doc_id"),
        size(w).as("n_words"),
        size(array_distinct(w)).as("n_distinct"),
        array_contains(w, "the").as("has_the"),
        element_at(array_sort(w), 1).as("first_sorted"),
        element_at(w, 1).as("first_word"),
        size(array_intersect(w, array(lit("a"), lit("the"), lit("key")))).as("n_special"))
        .orderBy(col("doc_id"))
    }),

    // CSV line round-trip through the codegen'd from_csv parse (reference
    // InteractionLineSplitter): serialize interactions to `u,i,ts` lines,
    // parse back, verify against the source values.
    "csv_parse" -> ((s, dir) => {
      val lines = Cooccurrence.interactions(s, dir)
        .select(concat_ws(",",
          col("user"), col("item"), unix_millis(col("ts"))).as("value"))
      Main.parseCsvLines(lines)
        .select(col("user"), col("item"), unix_millis(col("ts")).as("ts_ms"))
        .orderBy(col("user"), col("item"), col("ts_ms"))
    }),

    // --- Structured Streaming surface (run to completion via AvailableNow,
    //     materialized to memory sinks, then oracle-compared like batch) ---

    "stream_windowed_agg" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamWindowedAgg(s, dir)),

    // transformWithState reservoir with kMax >= data size reduces to the
    // append path == the batch C matrix (cooc_pairs oracle).
    "stream_reservoir_cooc" -> ((s, dir) => {
      // RocksDB provider set for THIS query only, prior value restored
      // (same shared-session discipline as ItemCutStream/TopKStream)
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prior = s.conf.getOption(providerKey)
      s.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try graft.streaming.StreamingOps.withStreamWidth(s, dir) {
        val inter = graft.streaming.StreamingOps.eventsStream(s, dir)
          .select(
            col("user_id").cast("int").as("user"),
            get_json_object(col("props"), "$.k").cast("int").as("item"),
            col("ts"))
        graft.streaming.ReservoirStream.coocCounts(inter, kMax = 1000000, seed = 42L)
      }.orderBy(col("item"), col("other"))
      finally prior match {
        case Some(v) => s.conf.set(providerKey, v)
        case None => s.conf.unset(providerKey)
      }
    }),

    // foreachBatch incremental pipeline with cuts >= data size: equals the
    // batch LLR result exactly (llrTopKFullSql oracle).
    "stream_cooc_llr_topk" -> ((s, dir) =>
      graft.streaming.StreamingOps.withStreamWidth(s, dir) {
        graft.streaming.StreamingCooc.llrTopKStreaming(s, dir,
          fMax = 1000000, kMax = 1000000, seed = 42L, k = 10)
      })
  )

  // ------------------------------------------------------------------
  // DuckDB oracles
  // ------------------------------------------------------------------

  /** Distinct unigram words per doc. */
  private val wordsSql =
    "SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents"

  /** CTE chain `n, common, j` computing exact jaccard (`j(doc_a, doc_b,
    * jac)`) over candidate pairs (cand: doc_a, doc_b) and the word table
    * `w`. */
  private val jaccardJoinCtes: String =
    """n AS (SELECT doc_id, COUNT(*) AS n_w FROM w GROUP BY doc_id),
      |common AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      |  FROM cand c
      |  JOIN w wa ON wa.doc_id = c.doc_a
      |  JOIN w wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
      |  GROUP BY c.doc_a, c.doc_b),
      |j AS (
      |  SELECT doc_a, doc_b,
      |         n_common * 1.0 / (na.n_w + nb.n_w - n_common) AS jac
      |  FROM common
      |  JOIN n na ON na.doc_id = doc_a
      |  JOIN n nb ON nb.doc_id = doc_b)""".stripMargin

  /** Exact-jaccard verification over candidate pairs (cand: doc_a, doc_b). */
  private def jaccardVerifySql(threshold: Double): String =
    s"""$jaccardJoinCtes
       |SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM j
       |WHERE jac >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** CTE chain ending in `j(doc_a, doc_b, jac)` — the doc-grain
    * MinHash-LSH candidate + exact-jaccard pipeline, shared by the
    * near-dup oracle and the minhash connected-components oracle
    * (ExtQueries42). */
  private[graft] val minhashJoinCtes: String = {
    val mhExprs = (0 until NumHashes)
      .map(j => s"MIN(${minhashSql(j, "hm")}) AS mh$j").mkString(",\n  ")
    val bandSelects = (0 until NumBands).map { bnd =>
      val sig = (bnd * BandRows until (bnd + 1) * BandRows)
        .map(j => s"CAST(mh$j AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $bnd AS band, concat_ws(',', $sig) AS sig FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""w AS ($wordsSql),
       |hm AS (SELECT doc_id, ${hModSql("word")} AS hm FROM w),
       |sig AS (SELECT doc_id, $mhExprs FROM hm GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |$jaccardJoinCtes""".stripMargin
  }

  private val minhashLshSql: String =
    s"""WITH $minhashJoinCtes
       |SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM j
       |WHERE jac >= 0.9 ORDER BY doc_a, doc_b""".stripMargin

  /** CTE chain ending in `pairs(doc_a, doc_b, fp_a, fp_b)` — shared by
    * the simhash near-dup oracle and the connected-components oracle
    * (ExtQueries4). */
  private[graft] val simhashPairsCtes: String = {
    val bitSums = (0 until SimHashBits)
      .map(i => s"SUM(((h >> $i) & 1) * 2 - 1) AS s$i").mkString(",\n  ")
    val fp = (0 until SimHashBits)
      .map(i => s"(CASE WHEN s$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    val chunks = (0 until SimHashChunks)
      .map(c => s"((fp >> ${c * ChunkBits}) & ${(1L << ChunkBits) - 1}) AS c$c").mkString(", ")
    val chunkJoins = (0 until SimHashChunks).map { c =>
      s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp AS fp_a, b.fp AS fp_b
         |  FROM chunked a JOIN chunked b ON a.c$c = b.c$c AND a.doc_id < b.doc_id""".stripMargin
    }.mkString("\n  UNION ")
    s"""w AS ($wordsSql),
       |hw AS (SELECT doc_id, ${hSql("word")} AS h FROM w),
       |sums AS (SELECT doc_id, $bitSums FROM hw GROUP BY doc_id),
       |fps AS (SELECT doc_id, ($fp) AS fp FROM sums),
       |chunked AS (SELECT doc_id, fp, $chunks FROM fps),
       |pairs AS (
       |  $chunkJoins)""".stripMargin
  }

  private val simhashSql: String =
    s"""WITH $simhashPairsCtes
       |SELECT doc_a, doc_b, bit_count(xor(fp_a, fp_b)) AS hamming FROM pairs
       |WHERE bit_count(xor(fp_a, fp_b)) <= 3 ORDER BY doc_a, doc_b""".stripMargin

  /** Quantized embedding vectors: exact integer dot products. */
  private[graft] val quantSql =
    """q AS (
      |  SELECT vec_id,
      |         [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
      |  FROM embeddings),
      |qn AS (SELECT vec_id, qv, list_inner_product(qv, qv) AS n2 FROM q)""".stripMargin

  /** Sign-random-projection bucket as SQL, GENERATED from the same
    * literal plane signs as `Similarity.lshBucket` — bit i set when
    * plane `planes(i)`'s signed projection is positive. */
  private[graft] def bucketSql(planes: Range, dims: Int = 64): String =
    planes.zipWithIndex.map { case (p, i) =>
      val signs = Similarity.planeSigns(p, dims).mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product(qv, $signs) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def oracleSql: Map[String, String] = Map(
    // the sketch contract is the oracle: exact distinct counts from SQL,
    // and the within-bound flag must be 1 for every group
    "approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
        |       COUNT(*) AS n, 1 AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "ann_topk_lsh" ->
      s"""WITH $quantSql,
         |bk AS (SELECT vec_id, qv, n2, ${bucketSql(0 until 4)} AS bucket FROM qn),
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2,
         |         unnest([bucket, xor(bucket, 1), xor(bucket, 2),
         |                 xor(bucket, 4), xor(bucket, 8)]) AS bucket
         |  FROM bk WHERE vec_id IN (${AnnQueries.mkString(", ")})),
         |scored AS (
         |  SELECT p.query_id, c.vec_id,
         |         ROUND(list_inner_product(p.qqv, c.qv) / (sqrt(p.qn2) * sqrt(c.n2)), 4) AS cos
         |  FROM probes p JOIN bk c ON c.bucket = p.bucket AND c.vec_id != p.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    "ann_ivf_sound" ->
      s"""SELECT CAST(query_id AS BIGINT) AS query_id, true AS scores_exact,
         |       true AS ranks_ok, true AS bounded_by_exact
         |FROM (VALUES ${AnnQueries.map(q => s"($q)").mkString(", ")}) t(query_id)
         |ORDER BY query_id""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""WITH $quantSql,
         |bk AS (SELECT vec_id, qv, n2, ${bucketSql(0 until 4)} AS bkt0,
         |              ${bucketSql(4 until 8)} AS bkt1 FROM qn),
         |pairs AS (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |         list_inner_product(x.qv, y.qv) / (sqrt(x.n2) * sqrt(y.n2)) AS cosr
         |  FROM bk x JOIN bk y
         |    ON x.vec_id < y.vec_id AND (x.bkt0 = y.bkt0 OR x.bkt1 = y.bkt1))
         |SELECT vec_a, vec_b, ROUND(cosr, 4) AS cos FROM pairs
         |WHERE cosr >= 0.30 ORDER BY vec_a, vec_b""".stripMargin,

    "join_asof" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS DATE))
        |SELECT event_id, user_id, COALESCE(o_orderkey, -1) AS asof_order,
        |       COALESCE(strftime(o_orderdate, '%Y-%m-%d'), 'none') AS asof_date
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "join_range" ->
      """WITH tiers(tier, lo, hi) AS (VALUES
        |  ('small', 0.0, 50000.0), ('medium', 50000.0, 150000.0),
        |  ('large', 150000.0, 1000000000.0))
        |SELECT tier, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,

    "percentile_agg" ->
      """SELECT o_orderpriority,
        |       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "scalar_string2" ->
      """SELECT c_custkey,
        |       regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        |       reverse(c_name) AS rev,
        |       repeat('-', 3) AS dashes,
        |       CAST(COALESCE(strpos(c_name, '#'), 0) AS INT) AS hash_pos
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "cube_agg" ->
      """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
        |       l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "pivot_agg" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (event_type = 'click') AS click,
        |       COUNT(*) FILTER (event_type = 'error') AS error,
        |       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (event_type = 'signup') AS signup,
        |       COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "scalar_null" ->
      """SELECT o_orderkey,
        |       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_c,
        |       COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'urgent') AS prio_c,
        |       CASE WHEN o_orderpriority IS NULL THEN 0
        |            ELSE LENGTH(o_orderpriority) END AS plen
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "windowed_sliding" ->
      """WITH ev AS (SELECT date_trunc('day', ts) AS d0, event_type FROM events),
        |x AS (SELECT unnest([d0, d0 - INTERVAL 1 DAY]) AS ws, event_type FROM ev)
        |SELECT strftime(ws, '%Y-%m-%d') AS wstart, event_type, COUNT(*) AS n
        |FROM x GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin,

    "windowed_session" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sgrp AS (
        |  SELECT user_id,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |sess AS (SELECT user_id, sid, COUNT(*) AS n_events FROM sgrp GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       MAX(n_events) AS max_session_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q5_multijoin" ->
      """SELECT r_name, n_name,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
        |                (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))),
        |            2) AS DOUBLE)
        |         AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "group_topk_heap" ->
      """WITH cnt AS (
        |  SELECT user_id, CAST(json_extract_string(props, 'k') AS INT) AS item, COUNT(*) AS n
        |  FROM events GROUP BY user_id, item),
        |ranked AS (
        |  SELECT user_id, item, n,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, item) AS rnk
        |  FROM cnt)
        |SELECT user_id, rnk, item, n FROM ranked WHERE rnk <= 3
        |ORDER BY user_id, rnk""".stripMargin,

    "salted_join" ->
      """SELECT s_name, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "scalar_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, len(w) AS n_words,
        |       len(list_distinct(w)) AS n_distinct,
        |       list_contains(w, 'the') AS has_the,
        |       list_sort(w)[1] AS first_sorted,
        |       w[1] AS first_word,
        |       len(list_intersect(list_distinct(w), ['a', 'the', 'key'])) AS n_special
        |FROM t ORDER BY doc_id""".stripMargin,

    "csv_parse" ->
      s"""WITH inter AS (${SparkEntry.interSql})
         |SELECT usr AS "user", item, epoch_ms(ts) AS ts_ms
         |FROM inter ORDER BY "user", item, ts_ms""".stripMargin,

    "stream_windowed_agg" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,

    "stream_reservoir_cooc" ->
      (SparkEntry.pairsSql + "SELECT item, other, cnt FROM pairs ORDER BY item, other"),

    "stream_cooc_llr_topk" -> SparkEntry.llrTopKFullSql,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc
        |FROM documents GROUP BY text_hash ORDER BY text_hash""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
         |w AS (
         |  SELECT DISTINCT doc_id, wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2] AS word
         |  FROM t, UNNEST(range(1, len(wd) - 1)) AS r(i)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id),
         |${jaccardVerifySql(0.1)}""".stripMargin,

    "dedup_minhash_lsh" -> minhashLshSql,

    "dedup_simhash" -> simhashSql,

    // Mirrors the 4-band SRP banding from the same literal plane signs;
    // the OR-of-band-equalities join emits each pair once (set semantics),
    // matching the Spark side's first-colliding-band canonicalization.
    "dedup_embedding" ->
      s"""WITH $quantSql,
         |bk AS (SELECT vec_id, qv, n2, ${bucketSql(0 until 4)} AS bkt0,
         |              ${bucketSql(4 until 8)} AS bkt1,
         |              ${bucketSql(8 until 12)} AS bkt2,
         |              ${bucketSql(12 until 16)} AS bkt3 FROM qn),
         |pairs AS (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |         list_inner_product(x.qv, y.qv) / (sqrt(x.n2) * sqrt(y.n2)) AS cosr
         |  FROM bk x JOIN bk y
         |    ON x.vec_id < y.vec_id AND (x.bkt0 = y.bkt0 OR x.bkt1 = y.bkt1
         |                                OR x.bkt2 = y.bkt2 OR x.bkt3 = y.bkt3))
         |SELECT vec_a, vec_b, ROUND(cosr, 4) AS cos FROM pairs
         |WHERE cosr >= 0.30 ORDER BY vec_a, vec_b""".stripMargin,

    // full replay of the IVF index (r13): the integer truncated-mean k-means
    // is exact, so DuckDB reproduces seeds -> 3 Lloyd iterations ->
    // assignment -> probe ranking -> in-list cosine bit-for-bit. Every
    // distance is the same relative form the Spark side uses
    // (|c|^2 - 2<v,c>, exact integers <= 2^53, ties to the lower
    // centroid id); empty clusters keep their previous centroid via the
    // COALESCE. Valid while the corpus is within IvfIndex's fit-sample
    // cap (2^18 rows) — true at every driver gate SF.
    "ann_topk_ivf" ->
      s"""WITH RECURSIVE $quantSql,
         |seeds AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c,
         |         qv AS cv
         |  FROM (SELECT vec_id, qv FROM qn ORDER BY vec_id LIMIT 16) z),
         |km(iter, c, cv) AS (
         |  SELECT CAST(0 AS BIGINT), c, cv FROM seeds
         |  UNION ALL
         |  (
         |  WITH dists AS (
         |    SELECT v.vec_id, v.qv, k2.c,
         |           list_inner_product(k2.cv, k2.cv)
         |             - 2 * list_inner_product(v.qv, k2.cv) AS d
         |    FROM qn v CROSS JOIN km k2),
         |  asg AS (
         |    SELECT vec_id, qv, c AS cl FROM (
         |      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |      FROM dists) x WHERE rn = 1),
         |  mean AS (
         |    SELECT cl, i, CAST(SUM(qv[i]) // COUNT(*) AS BIGINT) AS m
         |    FROM asg, UNNEST(range(1, len(qv) + 1)) t(i)
         |    GROUP BY cl, i),
         |  mlist AS (SELECT cl, list(m ORDER BY i) AS mv FROM mean GROUP BY cl)
         |  SELECT (SELECT MAX(k3.iter) FROM km k3) + 1, km.c, COALESCE(ml.mv, km.cv)
         |  FROM km LEFT JOIN mlist ml ON ml.cl = km.c
         |  WHERE (SELECT MAX(k4.iter) FROM km k4) < 3
         |  )
         |),
         |fin AS (SELECT c, cv FROM km WHERE iter = 3),
         |fdists AS (
         |  SELECT v.vec_id, v.qv, v.n2, f.c,
         |         list_inner_product(f.cv, f.cv)
         |           - 2 * list_inner_product(v.qv, f.cv) AS d
         |  FROM qn v CROSS JOIN fin f),
         |indexed AS (
         |  SELECT vec_id, qv, n2, c AS cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists) x WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists WHERE vec_id IN (${AnnQueries.mkString(", ")})) x
         |  WHERE rn <= 4),
         |scored AS (
         |  SELECT p.query_id, v.vec_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM probes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    "ann_topk_exact" ->
      s"""WITH $quantSql,
         |scored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv) / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN (${AnnQueries.mkString(", ")})),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    "text_token_stats" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens,
        |       length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" -> {
      val stop = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id, text, len(string_split(text, ' ')) AS n,
         |         len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS n_stop,
         |         len(regexp_extract_all(text, '[a-z]')) AS n_alpha
         |  FROM documents)
         |SELECT doc_id, n AS n_tokens,
         |       ROUND(n_stop * 1.0 / n, 4) AS stopword_ratio,
         |       ROUND(length(text) * 1.0 / n, 4) AS mean_token_len,
         |       ROUND(n_alpha * 1.0 / length(text), 4) AS alpha_ratio
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "text_langid" -> {
      val stop = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n,
         |         len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS n_stop
         |  FROM documents)
         |SELECT doc_id, lang AS labeled_lang,
         |       CASE WHEN n_stop * 1.0 / n >= 0.02 THEN 'en' ELSE 'unk' END AS predicted_lang
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
         |pw AS (SELECT doc_id, i, wd[i] AS word FROM t, UNNEST(range(1, len(wd) + 1)) AS r(i)),
         |terms AS (SELECT doc_id, (${hModSql("word")} * i) % $P AS term FROM pw)
         |SELECT doc_id, CAST(SUM(term) % $P AS BIGINT) AS fingerprint FROM terms
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "media_decode_stub" ->
      """WITH m AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         [CAST(('0x' || substr(hx, 2*i - 1, 2)) AS INT) for i in range(1, 17)] AS bytes
        |  FROM m)
        |SELECT doc_id, bytes[1] + 1 AS width, bytes[2] + 1 AS height,
        |       CAST(list_sum(bytes) AS BIGINT) AS sum_bytes, 4 AS n_frames,
        |       CAST(bytes[1] AS BIGINT) * 16777216 + bytes[5] * 65536 +
        |         bytes[9] * 256 + bytes[13] AS frame_sig
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
