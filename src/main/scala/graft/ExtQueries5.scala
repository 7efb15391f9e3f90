package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Tables}

/**
 * Round-4 surface widening: IGNORE NULLS window fills (LOCF gap
 * filling), deterministic mode aggregation, URL parsing +
 * canonicalization dedup, Gopher-style repetition quality signals,
 * n-gram-overlap benchmark decontamination, embedding centroids and
 * norms (quantized-exact), width_bucket histograms, array set
 * operations, forward as-of join, chunk-level corpus dedup
 * (RefinedWeb-style line dedup re-expressed over the space-delimited
 * synthetic docs), chained streaming aggregation, and extended string
 * scalars.
 *
 * Scale posture: everything is hash-agg / window-rank / equi-join
 * shaped. The two corpus ops keep the blocking discipline (chunk /
 * shingle equi-joins as the inverted index, never all-pairs); embedding
 * math rides the quantized-integer grid (Similarity.quantize) so
 * results are exact and engine-portable at any parallelism.
 */
object ExtQueries5 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // LOCF gap filling: last non-null observation carried forward per
    // user in event order — lag/last with IGNORE NULLS, the standard
    // time-series repair. Window is rows-bounded running (partial
    // ordering per key, no global sort).
    "window_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .where(col("user_id") % 5 === 0)
        .withColumn("v", when(col("event_type") =!= "view", col("value")))
        .select(col("event_id"), col("user_id"),
          coalesce(last(col("v"), ignoreNulls = true).over(w), lit(-1.0)).as("filled"))
        .orderBy(col("event_id"))
    }),

    // deterministic mode: most frequent value per group, smallest value
    // winning ties — two-level hash agg (count, then argmax via struct
    // ordering), no sort. The struct (cnt, -qty) makes the tiebreak
    // explicit where a bare mode() would be engine-defined.
    "agg_mode" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("int").as("qty"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(
          max_by(col("qty"), struct(col("cnt"), -col("qty"))).as("mode_qty"),
          max(col("cnt")).as("mode_n"))
        .orderBy(col("l_returnflag"))),

    // URL scalar surface: parse_url host/path/query-param extraction
    // over deterministically synthesized URLs (oracle re-derives the
    // parts with regexes — independent derivation, same contract).
    "scalar_url" -> ((s, dir) => {
      val url = concat(lit("https://"), col("source"), lit(".example.com/"),
        col("lang"), lit("/doc/"), col("doc_id"),
        lit("?id="), col("doc_id"), lit("&utm_source=feed"))
      Tables.table(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY"), lit("id")).cast("long").as("qid"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization dedup: lowercase, strip query/fragment and
    // trailing slash, then group — the crawl-dedup step that collapses
    // tracking-param/scheme-case variants of one page. Pure scalar map
    // + one hash agg.
    "dedup_url" -> ((s, dir) => {
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/page/"), (col("doc_id") % 50))
      val url = when(col("doc_id") % 4 === 0, base)
        .when(col("doc_id") % 4 === 1, concat(base, lit("/")))
        .when(col("doc_id") % 4 === 2, concat(base, lit("?utm_source=x&utm_medium=y")))
        .otherwise(concat(upper(base), lit("#top")))
      val canon = regexp_replace(
        regexp_replace(lower(url), "[?#].*$", ""), "/$", "")
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), canon.as("canon"))
        .groupBy(col("canon"))
        .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n_dups"))
        .orderBy(col("canon"))
    }),

    // Gopher-style repetition signals: duplicate-word fraction and
    // top-word fraction per doc — the quality features that gate
    // boilerplate/keyword-stuffed pages out of training corpora.
    // explode + two hash aggs, all counts exact ints before the one
    // rounded division.
    "text_repetition" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_words"),
          count(lit(1)).as("n_distinct"),
          max(col("cnt")).as("top_cnt"))
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          round(col("top_cnt").cast("double") / col("n_words"), 4).as("top_frac"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 4).as("dup_frac"))
        .orderBy(col("doc_id"))),

    // n-gram-overlap decontamination: drop every corpus doc sharing ANY
    // 5-gram with the eval set (stricter than dedup_decontaminate's
    // whole-doc hash — catches partial contamination). The shingle
    // equi-join is the inverted index: eval shingles (small) semi-join
    // the corpus shingles; only matching doc_ids shuffle.
    "decontaminate_ngram" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val evalSh = Dedup.ngramShingles(docs.where(col("doc_id") % 10 === 3), 5)
        .select(col("shingle")).distinct()
      val corpus = docs.where(col("doc_id") % 10 =!= 3)
      val contaminated = Dedup.ngramShingles(corpus, 5)
        .join(evalSh, Seq("shingle"), "left_semi")
        .select(col("doc_id")).distinct()
      corpus.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // per-label embedding centroid: posexplode to (label, dim) cells,
    // quantized to the 1e-4 integer grid so the sums are exact longs
    // and the single double division is engine/partition-portable.
    // Hash agg over label x dim — fully partial-aggregatable.
    "embed_centroid" -> ((s, dir) =>
      Tables.table(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          round(col("x").cast("double") * 10000).cast("long").as("q"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          round(col("sq").cast("double") / col("n") / 10000.0, 6).as("c"))
        .orderBy(col("label"), col("dim"))),

    // top-20 vectors by L2 norm — the squared norm is an exact integer
    // via the quantized grid + the codegen'd long-array dot product
    // (LongArrayDot, no per-element row explosion: one expression eval
    // per vector, TakeOrderedAndProject for the top-k).
    "embed_norm_topk" -> ((s, dir) =>
      Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
        .select(col("vec_id"),
          graft.functions.LongArrayDot.dot(col("qv"), col("qv")).as("norm2"))
        .orderBy(col("norm2").desc, col("vec_id"))
        .limit(20)
        .orderBy(col("vec_id"))),

    // fixed-width histogram via width_bucket: bucket + count + exact
    // min/max per bucket (no double summation — order-independent
    // extremes only). One hash agg; bucket arithmetic is codegen'd.
    "agg_histogram" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .groupBy(width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0), lit(10))
          .cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bucket"))),

    // array set operations: intersect/except/overlap against a literal
    // keyword set, per doc — all codegen'd array expressions, no
    // explode, no shuffle beyond the final sort.
    "scalar_array_setops" -> ((s, dir) => {
      val kw = array(lit("key"), lit("value"), lit("table"), lit("row"), lit("scan"))
      Tables.table(s, dir, "documents")
        .where(col("doc_id") % 25 === 0)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("wds"))
        .select(col("doc_id"),
          array_join(array_sort(array_intersect(col("wds"), kw)), ",").as("kw_present"),
          size(array_except(kw, col("wds"))).as("kw_missing"),
          arrays_overlap(col("wds"), kw).as("has_kw"))
        .orderBy(col("doc_id"))
    }),

    // forward as-of join: each event matched to the user's NEXT order
    // on/after the event date (the mirror of join_asof's backward
    // match) — same window-rank-over-equi-join shape, no sort-merge of
    // the full cross product.
    "join_asof_forward" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("ed"))
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") >= col("ed"),
          "left_outer")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_id"), col("user_id"),
          coalesce(col("o_orderkey"), lit(-1L)).as("next_order"),
          coalesce(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("none")).as("next_date"))
        .orderBy(col("event_id"))
    }),

    // chunk-level corpus dedup (RefinedWeb line-dedup shape): docs are
    // split into 8-word chunks, each chunk kept only at its first
    // corpus occurrence (doc_id, pos order), docs rebuilt from
    // surviving chunks. The chunk hash partition IS the inverted
    // index; state per chunk is one row.
    "dedup_lines" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val chunks = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, cast(ceil(size(w)/8.0) as int) - 1)," +
            " i -> array_join(slice(w, i*8+1, 8), ' '))")).as(Seq("pos", "chunk")))
      val firstW = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("pos"))
      val rebuilt = chunks
        .withColumn("rn", row_number().over(firstW))
        .where(col("rn") === 1)
        .groupBy(col("doc_id"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk")), " ").as("cleaned"))
      docs.select(col("doc_id"))
        .join(rebuilt, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("cleaned"), lit("")).as("cleaned"))
        .orderBy(col("doc_id"))
    }),

    // chained streaming aggregation (two stateful operators in one
    // query): per-day-per-user counts re-aggregated to per-day user
    // counts/extremes — Spark 4 multi-stateful-operator support via
    // window(window_time(...)).
    "stream_two_level_agg" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamTwoLevelAgg(s, dir)),

    // extended string scalars: translate/repeat/reverse/split_part/
    // instr/left/right — all codegen'd, no UDF.
    "scalar_string3" -> ((s, dir) =>
      Tables.table(s, dir, "part")
        .where(col("p_partkey") % 7 === 0)
        .select(col("p_partkey"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          repeat(col("p_brand"), 2).as("rep"),
          reverse(col("p_type")).as("rev"),
          expr("split_part(p_name, ' ', 2)").as("second_word"),
          instr(col("p_name"), "e").as("pos_e"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_type, 3)").as("r3"))
        .orderBy(col("p_partkey")))
  )

  def oracleSql: Map[String, String] = Map(

    "window_ignore_nulls" ->
      """SELECT event_id, user_id,
        |  COALESCE(LAST_VALUE(CASE WHEN event_type <> 'view' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS filled
        |FROM events WHERE user_id % 5 = 0
        |ORDER BY event_id""".stripMargin,

    "agg_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, CAST(l_quantity AS INT) AS qty, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, qty, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                            ORDER BY cnt DESC, qty) AS rn
        |  FROM c)
        |SELECT l_returnflag, qty AS mode_qty, CAST(cnt AS BIGINT) AS mode_n
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    // independent derivation: regex part extraction instead of a URL parser
    "scalar_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/' || lang || '/doc/' ||
        |      CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR) ||
        |      '&utm_source=feed' AS url
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  CAST(regexp_extract(url, '[?&]id=([0-9]+)', 1) AS BIGINT) AS qid
        |FROM u ORDER BY doc_id""".stripMargin,

    "dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN b
        |      WHEN 1 THEN b || '/'
        |      WHEN 2 THEN b || '?utm_source=x&utm_medium=y'
        |      ELSE upper(b) || '#top' END AS url
        |  FROM (SELECT doc_id,
        |          'https://' || source || '.example.com/page/' ||
        |            CAST(doc_id % 50 AS VARCHAR) AS b
        |        FROM documents)),
        |c AS (SELECT doc_id,
        |        regexp_replace(regexp_replace(lower(url), '[?#].*$', ''), '/$', '') AS canon
        |      FROM u)
        |SELECT canon, MIN(doc_id) AS first_doc, CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM c GROUP BY canon ORDER BY canon""".stripMargin,

    "text_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        |  FROM documents WHERE doc_id % 5 = 0),
        |c AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
        |d AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
        |        CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |        CAST(MAX(cnt) AS BIGINT) AS top_cnt
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_words, n_distinct,
        |  round(CAST(top_cnt AS DOUBLE) / n_words, 4) AS top_frac,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 4) AS dup_frac
        |FROM d ORDER BY doc_id""".stripMargin,

    "decontaminate_ngram" ->
      """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
        |       FROM wd, UNNEST(range(1, len(w) - 3)) r(i)),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 3),
        |bad AS (SELECT DISTINCT doc_id FROM sh
        |        WHERE doc_id % 10 <> 3 AND shingle IN (SELECT shingle FROM ev))
        |SELECT doc_id FROM documents
        |WHERE doc_id % 10 <> 3 AND doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,

    "embed_centroid" ->
      """WITH q AS (
        |  SELECT label, CAST(i - 1 AS INT) AS dim,
        |         CAST(round(CAST(embedding[i] AS DOUBLE) * 10000, 0) AS BIGINT) AS q
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) r(i))
        |SELECT label, dim,
        |  round(CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / COUNT(*) / 10000.0, 6) AS c
        |FROM q GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "embed_norm_topk" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS qe
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) r(i)),
        |n AS (SELECT vec_id, CAST(SUM(qe * qe) AS BIGINT) AS norm2 FROM q GROUP BY vec_id),
        |t AS (SELECT vec_id, norm2,
        |        ROW_NUMBER() OVER (ORDER BY norm2 DESC, vec_id) AS rn FROM n)
        |SELECT vec_id, norm2 FROM t WHERE rn <= 20 ORDER BY vec_id""".stripMargin,

    // arithmetic bucket (uniform width) is width_bucket's contract,
    // derived independently; o_totalprice < 500000 at every SF so the
    // overflow bucket stays empty on both sides
    "agg_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000) + 1 AS INT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       round(MIN(o_totalprice), 2) AS lo,
        |       round(MAX(o_totalprice), 2) AS hi
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "scalar_array_setops" ->
      """WITH kw(w) AS (VALUES ('key'), ('value'), ('table'), ('row'), ('scan')),
        |d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS wds
        |      FROM documents WHERE doc_id % 25 = 0)
        |SELECT doc_id,
        |  COALESCE((SELECT string_agg(w, ',' ORDER BY w) FROM kw
        |            WHERE list_contains(d.wds, kw.w)), '') AS kw_present,
        |  CAST((SELECT COUNT(*) FROM kw WHERE NOT list_contains(d.wds, kw.w)) AS INT) AS kw_missing,
        |  EXISTS(SELECT 1 FROM kw WHERE list_contains(d.wds, kw.w)) AS has_kw
        |FROM d ORDER BY doc_id""".stripMargin,

    "join_asof_forward" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate >= CAST(e.ts AS DATE))
        |SELECT event_id, user_id, COALESCE(o_orderkey, -1) AS next_order,
        |       COALESCE(strftime(o_orderdate, '%Y-%m-%d'), 'none') AS next_date
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "dedup_lines" ->
      """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |         array_to_string(w[(i*8+1):(i*8+8)], ' ') AS chunk
        |       FROM wd, UNNEST(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) r(i)),
        |k AS (SELECT doc_id, pos, chunk,
        |        ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        |      FROM ch),
        |rb AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS cleaned
        |       FROM k WHERE rn = 1 GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(rb.cleaned, '') AS cleaned
        |FROM documents d LEFT JOIN rb ON d.doc_id = rb.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // append-mode chained aggs emit only watermark-closed windows: the
    // day containing max(ts) is still open at end-of-stream -> excluded
    "stream_two_level_agg" ->
      """WITH mx AS (SELECT strftime(MAX(ts), '%Y-%m-%d') AS lastday FROM events),
        |l1 AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id, COUNT(*) AS n
        |       FROM events GROUP BY 1, 2)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(MAX(n) AS BIGINT) AS max_n,
        |       CAST(SUM(n) AS BIGINT) AS n_events
        |FROM l1 WHERE day < (SELECT lastday FROM mx)
        |GROUP BY day ORDER BY day""".stripMargin,

    "scalar_string3" ->
      """SELECT p_partkey,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tr,
        |  repeat(p_brand, 2) AS rep,
        |  reverse(p_type) AS rev,
        |  split_part(p_name, ' ', 2) AS second_word,
        |  CAST(strpos(p_name, 'e') AS INT) AS pos_e,
        |  left(p_name, 4) AS l4,
        |  right(p_type, 3) AS r3
        |FROM part WHERE p_partkey % 7 = 0
        |ORDER BY p_partkey""".stripMargin
  )
}
