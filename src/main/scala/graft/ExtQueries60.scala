package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, IvfIndex, Retrieval, Tables}
import graft.streaming.LexicalIndexMaintenance

/**
 * Round 16, wave C: the STANDING LEXICAL (BM25) INDEX
 * ([[graft.streaming.LexicalIndexMaintenance]]) — the sparse-retrieval
 * member of the maintenance family, closing the hybrid read's
 * asymmetry: until now the dense leg read a standing IVF artifact while
 * the sparse leg recomputed corpus-sized tokenize/tf/df/doclen
 * aggregates per query.
 *
 *  - stream_bm25_refresh: the corpus drains as one file per microbatch
 *    into per-batch postings/doclens segments (live compaction inside
 *    the drain at compactEvery=2); the serve reads ONLY the query
 *    terms' postings (term predicate pushed to the segment scan) plus a
 *    memoized doc-cardinality stats row. Oracle: the full batch BM25
 *    replay (text_bm25's CTEs) — maintained serve == batch scorer, by
 *    shared arithmetic ([[Retrieval.bm25FromPostings]]).
 *  - stream_bm25_delete: the right-to-erasure verb — batch 3 tombstones
 *    a doc slice ON the compaction cadence (the physical-purge read
 *    path); df, N and avgdl all reflect the erasure because the serve
 *    derives them from the live folds. Oracle: the same replay over the
 *    kept documents only.
 *  - retrieval_hybrid_rrf_standing: the deployment hybrid read — BOTH
 *    legs served from standing artifacts (maintained lexical index +
 *    memoized IVF probe read), RRF-fused. Oracle: identical SQL to
 *    retrieval_hybrid_rrf_ivf (the maintained sparse leg is hash-equal
 *    to the batch leg, so the fused result is too).
 *  - text_phrase_search / stream_phrase_search: exact phrase matching
 *    via the one-shuffle vote algebra ([[Retrieval.phraseMatches]]) —
 *    batch posexplode scan vs the standing POSITIONAL segments (the
 *    Lucene position-list read); ONE oracle cross-checks both.
 *  - retrieval_more_like_this: the Lucene MLT serve — the query doc's
 *    top tf·idf terms (1e-6 grid, term tie-break) run as a BM25 query
 *    through the shared scorer.
 */
object ExtQueries60 {

  private val NLists = 16
  private val IvfIters = 3
  private val NProbe = 4
  private val Terms = Seq("key", "value", "table", "row", "scan")
  private val DenseQ = 3L
  private val LegN = 50
  private val RrfK = 60
  private val TopK = 20
  private val Phrases =
    Seq("table scan", "key value", "hash join", "table scan merge")

  private val runs = new java.util.concurrent.atomic.AtomicLong()

  private val standingCache =
    new java.util.concurrent.ConcurrentHashMap[String, LexicalIndexMaintenance]()

  /** The STANDING lexical index for the SERVE-family queries
    * (retrieval_boolean / retrieval_more_like_this /
    * retrieval_hybrid_rrf_standing): built by one drain per
    * (corpus content-fingerprint, SparkContext), then served from — the
    * DedupIndex/AnnIndex build-once/serve-many memo pattern (r16 opt
    * round). These queries' declared semantics is "serve from a standing
    * artifact"; re-draining a fresh root per invocation timed the BUILD
    * three more times per bench rep, while the maintenance loop itself
    * stays on the gate via the fresh-root stream_bm25_* /
    * stream_phrase_search drains below. Keyed like DedupIndex: content
    * fingerprint (driver regen-safe) + context identity (a restarted
    * context re-drains — the on-disk roots die with the JVM's tmp dir). */
  private def standing(s: SparkSession, dir: String): LexicalIndexMaintenance = {
    val fp = graft.operators.DedupIndex.fingerprint(s, s"$dir/documents.parquet")
    val ctx = s.sparkContext.applicationId + ":" + s.sparkContext.startTime
    standingCache.computeIfAbsent(s"$dir|$fp|$ctx", _ => drained(s, dir))
  }

  /** Drain the staged 3-chunk documents corpus into a fresh maintained
    * lexical index (one file per microbatch, compactEvery=2 so a live
    * compaction lands inside the drain). */
  private def drained(s: SparkSession, dir: String,
      positions: Boolean = false): LexicalIndexMaintenance = {
    import org.apache.spark.sql.streaming.Trigger
    val staged = ExtQueries43.stagedDocChunks(s, dir)
    val schema = Tables.table(s, dir, "documents").schema
    val root = graft.operators.Sinks.dir(
      "lex_maint/run" + runs.incrementAndGet())
    val maint = new LexicalIndexMaintenance(s, root, compactEvery = 2,
      positions = positions)
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        maint.processBatch(id, b)
        ()
      }
      .start()
    q.awaitTermination()
    maint
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "stream_bm25_refresh" -> ((s, dir) =>
      drained(s, dir).topK(Terms, TopK).orderBy(col("rnk"))),

    "stream_bm25_delete" -> ((s, dir) => {
      val maint = drained(s, dir)
      // batch 3 lands on the compactEvery=2 cadence: the serve below
      // reads a snapshot that PHYSICALLY excludes the deleted docs
      maint.deleteBatch(3L, Tables.table(s, dir, "documents")
        .where(col("doc_id") % 10 === 2).select("doc_id"))
      maint.topK(Terms, TopK).orderBy(col("rnk"))
    }),

    // EXACT PHRASE SEARCH, batch form: one posexplode over documents →
    // the one-shuffle vote algebra (no m-way self-join; the only join is
    // against the broadcast (phrase, i, term) table)
    "text_phrase_search" -> ((s, dir) =>
      Retrieval.phraseMatches(
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "term"))),
        Phrases).orderBy(col("phrase"), col("doc_id"))),

    // ...and the standing-index form: the drained positional segments
    // serve the same phrases reading ONLY those terms' position lists
    // (term predicate pushed to the segment scan — the Lucene
    // position-list read); hash-equal to the batch scan by shared algebra
    "stream_phrase_search" -> ((s, dir) =>
      drained(s, dir, positions = true).phraseSearch(Phrases)
        .orderBy(col("phrase"), col("doc_id"))),

    // BOOLEAN retrieval (MUST all of / MUST_NOT any of) from the
    // standing index — BM25-ranked over the must terms
    "retrieval_boolean" -> ((s, dir) =>
      standing(s, dir).booleanTopK(
          must = Seq("table", "scan"), mustNot = Seq("slow"), k = 10)
        .orderBy(col("rnk"))),

    // MORE-LIKE-THIS from the standing index (the Lucene serve shape):
    // the query doc's top tf·idf terms become an ordinary BM25 query
    "retrieval_more_like_this" -> ((s, dir) =>
      standing(s, dir).moreLikeThis(DenseQ, maxTerms = 8, k = 10)
        .orderBy(col("rnk"))),

    "retrieval_hybrid_rrf_standing" -> ((s, dir) => {
      val sparse = Retrieval.rankLeg(standing(s, dir).bm25(Terms), "bm25", LegN)
      val idx = AnnIndex.ivf(s, dir, NLists, IvfIters)
      val dense = IvfIndex
        .topKFrom(idx.centroids, idx.assigned, Seq(DenseQ), LegN, NProbe)
        .select(col("vec_id").as("doc_id"), col("rnk"))
      Retrieval.rrfFuse(sparse, dense, RrfK, topN = TopK)
        .orderBy(col("doc_id"))
    })
  )

  /** The batch BM25 replay (text_bm25's CTE chain) over documents
    * matching `docPred`, ending in the scored `agg(doc_id, bm25)`. */
  private def bm25Ctes(docPred: String): String =
    s"""tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
       |       FROM documents WHERE $docPred),
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |       WHERE term IN (${Terms.map(t => s"'$t'").mkString(",")}) GROUP BY 1, 2),
       |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |         ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * 2.2 /
       |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
       |       FROM tf JOIN df ON tf.term = df.term
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
       |agg AS (SELECT doc_id,
       |          round(CAST(SUM(CAST(round(tscore, 8) AS DECIMAL(20,8))) AS DOUBLE), 4) AS bm25
       |        FROM sc GROUP BY 1)""".stripMargin

  private def topkSql(docPred: String): String =
    s"""WITH ${bm25Ctes(docPred)},
       |r AS (SELECT doc_id, bm25,
       |        ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
       |      FROM agg)
       |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, bm25 FROM r
       |WHERE rnk <= $TopK ORDER BY rnk""".stripMargin

  /** The phrase-match replay: positional tokens via generate_series +
    * list indexing, the same vote algebra (group by candidate start,
    * all m indices present), identical for the batch and standing forms. */
  private val phraseSql: String = {
    val phraseRows = Phrases.flatMap { p =>
      val ts = p.split(" ")
      ts.zipWithIndex.map { case (t, i) => s"('$p', $i, '$t', ${ts.length})" }
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
       |tok AS (SELECT doc_id, arr[i] AS term, i - 1 AS pos
       |        FROM d, UNNEST(generate_series(1, len(arr))) AS t(i)),
       |ph(phrase, i, term, m) AS (VALUES $phraseRows),
       |hits AS (SELECT p.phrase, t.doc_id, t.pos - p.i AS base, p.m,
       |           COUNT(DISTINCT p.i) AS k
       |         FROM tok t JOIN ph p ON t.term = p.term
       |         GROUP BY 1, 2, 3, 4
       |         HAVING COUNT(DISTINCT p.i) = p.m)
       |SELECT phrase, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
       |       CAST(MIN(base) AS BIGINT) AS first_pos
       |FROM hits GROUP BY 1, 2 ORDER BY phrase, doc_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    // one oracle, two implementations: the batch posexplode scan and the
    // standing positional-segment serve must both match it
    "text_phrase_search" -> phraseSql,
    "stream_phrase_search" -> phraseSql,

    // the OR-query BM25 chain over the must terms, restricted to docs
    // holding BOTH and excluding any 'slow' doc, ranks re-packed
    "retrieval_boolean" ->
      s"""WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
         |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
         |       WHERE term IN ('table', 'scan') GROUP BY 1, 2),
         |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |         ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * 2.2 /
         |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
         |       FROM tf JOIN df ON tf.term = df.term
         |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
         |agg AS (SELECT doc_id,
         |          round(CAST(SUM(CAST(round(tscore, 8) AS DECIMAL(20,8))) AS DOUBLE), 4) AS bm25
         |        FROM sc GROUP BY 1),
         |mdocs AS (SELECT doc_id FROM tf GROUP BY doc_id
         |          HAVING COUNT(DISTINCT term) = 2),
         |ndocs AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'slow'),
         |r AS (SELECT a.doc_id, a.bm25,
         |        ROW_NUMBER() OVER (ORDER BY a.bm25 DESC, a.doc_id) AS rnk
         |      FROM agg a JOIN mdocs m ON a.doc_id = m.doc_id
         |      WHERE a.doc_id NOT IN (SELECT doc_id FROM ndocs))
         |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, bm25 FROM r
         |WHERE rnk <= 10 ORDER BY rnk""".stripMargin,

    // term selection (doc 3's tf·idf head, 1e-6 grid, term tie-break)
    // + the full BM25 replay with those terms; query doc leaves AFTER
    // scoring so df stays the full-corpus value
    "retrieval_more_like_this" ->
      s"""WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
         |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
         |qtf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS qtf FROM tok
         |        WHERE doc_id = $DenseQ GROUP BY 1),
         |dfq AS (SELECT t.term, CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS df
         |        FROM tok t JOIN qtf q ON t.term = q.term GROUP BY 1),
         |sel AS (SELECT term FROM (
         |  SELECT q.term, ROW_NUMBER() OVER (ORDER BY
         |      round(q.qtf * ln((st.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 6)
         |        DESC, q.term) AS trnk
         |  FROM qtf q JOIN dfq d ON q.term = d.term CROSS JOIN st) z
         |  WHERE trnk <= 8),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
         |       WHERE term IN (SELECT term FROM sel) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |         ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * 2.2 /
         |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
         |       FROM tf JOIN df ON tf.term = df.term
         |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
         |agg AS (SELECT doc_id,
         |          round(CAST(SUM(CAST(round(tscore, 8) AS DECIMAL(20,8))) AS DOUBLE), 4) AS bm25
         |        FROM sc GROUP BY 1),
         |r AS (SELECT doc_id, bm25,
         |        ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
         |      FROM agg WHERE doc_id != $DenseQ)
         |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, bm25 FROM r
         |WHERE rnk <= 10 ORDER BY rnk""".stripMargin,

    // maintained drain == the batch BM25 scorer over the full corpus
    "stream_bm25_refresh" -> topkSql("TRUE"),

    // ...and after the tombstone batch, over the KEPT corpus only —
    // df/N/avgdl shift exactly as if the docs never existed
    "stream_bm25_delete" -> topkSql("doc_id % 10 != 2"),

    // identical SQL to retrieval_hybrid_rrf_ivf: the maintained sparse
    // leg is hash-equal to the batch leg, so the fusion is too
    "retrieval_hybrid_rrf_standing" ->
      s"""WITH RECURSIVE ${bm25Ctes("TRUE")},
         |sleg AS (SELECT doc_id, rnk FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
         |  FROM agg) z WHERE rnk <= $LegN),
         |${ExtQueries.quantSql},
         |${ExtQueries46.ivfReplayBody("TRUE")},
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists WHERE vec_id = $DenseQ) x
         |  WHERE rn <= $NProbe),
         |dsc AS (
         |  SELECT v.vec_id AS doc_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM probes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
         |dleg AS (SELECT doc_id, rnk FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rnk
         |  FROM dsc) z WHERE rnk <= $LegN),
         |fused AS (SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         |    ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + s.rnk), 0)
         |        + COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + d.rnk), 0), 6) AS rrf,
         |    CAST(COALESCE(s.rnk, 0) AS BIGINT) AS srnk,
         |    CAST(COALESCE(d.rnk, 0) AS BIGINT) AS drnk
         |  FROM sleg s FULL OUTER JOIN dleg d ON d.doc_id = s.doc_id),
         |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS frnk
         |       FROM fused)
         |SELECT doc_id, rrf, srnk, drnk FROM rk WHERE frnk <= $TopK
         |ORDER BY doc_id""".stripMargin
  )
}
