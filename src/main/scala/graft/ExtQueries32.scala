package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tables, TextAnalysis}

/**
 * Round-7 wave: corpus-evaluation operators — the measurements a
 * curation pipeline runs ON ITSELF. Integer-grid discipline (ppm /
 * per-mille via integer DIV); the one ln-based statistic (PSI)
 * quantizes each log-ratio to the milli grid before summing (the DSIR
 * discipline), so both engines produce bit-identical integers.
 *
 *  - langid_confusion: confusion matrix of the langid heuristic vs
 *    labels, with within-label share — the eval for a classifier the
 *    engine itself provides (text_langid).
 *  - psi_by_source: Population Stability Index of each source's
 *    doc-length distribution against the corpus — the standard drift
 *    score, here over fixed-width bins with +1ppm smoothing.
 *  - dedup_containment: ASYMMETRIC near-dup detection — containment
 *    |A∩B|/|A| over 5-gram shingle sets flags docs substantially
 *    embedded in another doc (quote/boilerplate inclusion), which
 *    symmetric Jaccard misses when sizes differ. Same inverted-index
 *    join bound as dedup_ngram_jaccard (fan-out = shingle df).
 *  - approx_distinct_overlap: audience overlap between event types via
 *    HLL inclusion-exclusion (est(a)+est(b)-est(a∪b)) checked against
 *    the exact overlap from one user-keyed type-bitmap pass; the
 *    sketch side is oracled as an error-bound flag (approx_distinct
 *    pattern).
 *  - contamination_score: per-doc FRACTION of 5-gram shingles shared
 *    with the eval split (decontaminate_ngram's binary verdict, made
 *    quantitative).
 */
object ExtQueries32 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "langid_confusion" -> ((s, dir) => {
      val pred = TextAnalysis.langId(Tables.table(s, dir, "documents"))
      val cells = pred.groupBy(col("labeled_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
      val totals = cells.groupBy(col("labeled_lang")).agg(sum(col("n")).as("n_label"))
      cells.join(broadcast(totals), "labeled_lang")
        .select(col("labeled_lang"), col("predicted_lang"), col("n"),
          expr("(n * 1000000) DIV n_label").as("share_ppm"))
        .orderBy(col("labeled_lang"), col("predicted_lang"))
    }),

    "psi_by_source" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
        .select(col("source"), expr("n_chars DIV 50").as("bucket"))
      val corpus = docs.groupBy(col("bucket")).agg(count(lit(1)).as("nc"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_total"))))
        .select(col("bucket"), expr("greatest((nc * 1000000) DIV n_total, 1)").as("pc_ppm"))
      val srcTotals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      val srcCounts = docs.groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("ns"))
      // scaffold source x bucket so empty bins contribute (smoothed to 1 ppm)
      val scaffold = srcTotals.crossJoin(broadcast(corpus))
      scaffold
        .join(srcCounts, Seq("source", "bucket"), "left_outer")
        .withColumn("ps_ppm",
          expr("greatest((coalesce(ns, 0) * 1000000) DIV n_src, 1)"))
        .withColumn("lr_milli",
          expr("CAST(FLOOR(LN(CAST(ps_ppm AS DOUBLE) / pc_ppm) * 1000) AS BIGINT)"))
        .groupBy(col("source"))
        .agg(max(col("n_src")).as("n_docs"),
          sum(expr("(ps_ppm - pc_ppm) * lr_milli")).as("psi_nano"))
        .orderBy(col("source"))
    }),

    "dedup_containment" -> ((s, dir) => {
      val sh = Dedup.ngramShingles(Tables.table(s, dir, "documents"), 5)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val common = sh.as("a")
        .join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))
      common
        .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))), "doc_a")
        .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))), "doc_b")
        .withColumn("cont_a_pm", expr("(n_common * 1000) DIV n_a"))
        .withColumn("cont_b_pm", expr("(n_common * 1000) DIV n_b"))
        .where(col("cont_a_pm") >= 500 || col("cont_b_pm") >= 500)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"),
          col("cont_a_pm"), col("cont_b_pm"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "approx_distinct_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pairs = for {
        i <- types.indices; j <- (i + 1) until types.length
      } yield (types(i), types(j))
      // exact overlaps: one user-keyed pass builds the type bitmap
      val flagCols = types.map(t =>
        max(when(col("event_type") === t, 1).otherwise(0)).as(s"has_$t"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(flagCols.head, flagCols.tail: _*)
      val exact = perUser.agg(
        pairs.head match { case (a, b) =>
          sum(expr(s"has_$a * has_$b")).as(s"x_${a}_$b") },
        pairs.tail.map { case (a, b) =>
          sum(expr(s"has_$a * has_$b")).as(s"x_${a}_$b") }: _*)
      // sketch side: per-type and per-pair-union HLL estimates (rsd 1%)
      val singles = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val pairDf = s.createDataFrame(pairs.map(p => (p._1, p._2))).toDF("type_a", "type_b")
      val unions = ev.join(broadcast(pairDf),
          col("event_type") === col("type_a") || col("event_type") === col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("est_union"))
      val exactRow = exact.collect().head
      val estRows = unions.collect().map { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        val est = singles(a) + singles(b) - r.getLong(2)
        val ex = exactRow.getAs[Long](s"x_${a}_$b")
        (a, b, ex, if (math.abs(est - ex) <= math.max(20L, ex / 10)) 1 else 0)
      }
      s.createDataFrame(estRows.sortBy(t => (t._1, t._2)))
        .toDF("type_a", "type_b", "exact_overlap", "within_10pct")
    }),

    "contamination_score" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val evalSh = Dedup.ngramShingles(docs.where(col("doc_id") % 10 === 3), 5)
        .select(col("shingle")).distinct()
      val corpusSh = Dedup.ngramShingles(docs.where(col("doc_id") % 10 =!= 3), 5)
      val hits = corpusSh.join(evalSh, Seq("shingle"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      corpusSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        .join(hits, Seq("doc_id"), "inner")
        .select(col("doc_id"), col("n_sh"), col("n_hit"),
          expr("(n_hit * 1000) DIV n_sh").as("contamination_pm"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = {
    val stop = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
    Map(

      "langid_confusion" ->
        s"""WITH t AS (
           |  SELECT doc_id, lang AS labeled_lang,
           |         CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ($stop)))
           |                   * 1.0 / len(string_split(text, ' ')) >= 0.02
           |              THEN 'en' ELSE 'unk' END AS predicted_lang
           |  FROM documents),
           |c AS (SELECT labeled_lang, predicted_lang, COUNT(*) AS n FROM t GROUP BY 1, 2),
           |tot AS (SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS n_label FROM c GROUP BY 1)
           |SELECT c.labeled_lang, predicted_lang, n,
           |       (n * 1000000) // n_label AS share_ppm
           |FROM c JOIN tot ON c.labeled_lang = tot.labeled_lang
           |ORDER BY c.labeled_lang, predicted_lang""".stripMargin,

      "psi_by_source" ->
        """WITH d AS (SELECT source, n_chars // 50 AS bucket FROM documents),
          |corpus AS (
          |  SELECT bucket,
          |         GREATEST((COUNT(*) * 1000000) // (SELECT COUNT(*) FROM d), 1) AS pc_ppm
          |  FROM d GROUP BY bucket),
          |st AS (SELECT source, COUNT(*) AS n_src FROM d GROUP BY source),
          |sc AS (SELECT source, bucket, COUNT(*) AS ns FROM d GROUP BY source, bucket),
          |scaffold AS (SELECT st.source, st.n_src, corpus.bucket, corpus.pc_ppm
          |             FROM st CROSS JOIN corpus),
          |j AS (
          |  SELECT s.source, s.n_src, s.pc_ppm,
          |         GREATEST((COALESCE(sc.ns, 0) * 1000000) // s.n_src, 1) AS ps_ppm
          |  FROM scaffold s LEFT JOIN sc
          |    ON s.source = sc.source AND s.bucket = sc.bucket),
          |terms AS (
          |  SELECT source, n_src, ps_ppm, pc_ppm,
          |         CAST(FLOOR(LN(CAST(ps_ppm AS DOUBLE) / pc_ppm) * 1000) AS BIGINT) AS lr_milli
          |  FROM j)
          |SELECT source, CAST(MAX(n_src) AS BIGINT) AS n_docs,
          |       CAST(SUM((ps_ppm - pc_ppm) * lr_milli) AS BIGINT) AS psi_nano
          |FROM terms GROUP BY source ORDER BY source""".stripMargin,

      "dedup_containment" ->
        """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |sh AS (SELECT DISTINCT doc_id,
          |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
          |       FROM wd, UNNEST(range(1, len(w) - 3)) r(i)),
          |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
          |common AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |scored AS (
          |  SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
          |         (n_common * 1000) // sa.n_sh AS cont_a_pm,
          |         (n_common * 1000) // sb.n_sh AS cont_b_pm
          |  FROM common
          |  JOIN sizes sa ON common.doc_a = sa.doc_id
          |  JOIN sizes sb ON common.doc_b = sb.doc_id)
          |SELECT * FROM scored WHERE cont_a_pm >= 500 OR cont_b_pm >= 500
          |ORDER BY doc_a, doc_b""".stripMargin,

      "approx_distinct_overlap" ->
        """WITH pu AS (
          |  SELECT user_id,
          |         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS h_click,
          |         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS h_error,
          |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS h_purchase,
          |         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS h_signup,
          |         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS h_view
          |  FROM events GROUP BY user_id),
          |p(type_a, type_b) AS (VALUES
          |  ('click','error'), ('click','purchase'), ('click','signup'), ('click','view'),
          |  ('error','purchase'), ('error','signup'), ('error','view'),
          |  ('purchase','signup'), ('purchase','view'), ('signup','view'))
          |SELECT type_a, type_b,
          |       CAST((SELECT SUM(
          |         (CASE type_a WHEN 'click' THEN h_click WHEN 'error' THEN h_error
          |               WHEN 'purchase' THEN h_purchase WHEN 'signup' THEN h_signup
          |               ELSE h_view END) *
          |         (CASE type_b WHEN 'click' THEN h_click WHEN 'error' THEN h_error
          |               WHEN 'purchase' THEN h_purchase WHEN 'signup' THEN h_signup
          |               ELSE h_view END)) FROM pu) AS BIGINT) AS exact_overlap,
          |       1 AS within_10pct
          |FROM p ORDER BY type_a, type_b""".stripMargin,

      "contamination_score" ->
        """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |sh AS (SELECT DISTINCT doc_id,
          |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
          |       FROM wd, UNNEST(range(1, len(w) - 3)) r(i)),
          |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 3),
          |cs AS (SELECT * FROM sh WHERE doc_id % 10 <> 3),
          |hits AS (SELECT doc_id, COUNT(*) AS n_hit FROM cs
          |         WHERE shingle IN (SELECT shingle FROM ev) GROUP BY doc_id),
          |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM cs GROUP BY doc_id)
          |SELECT sizes.doc_id, n_sh, n_hit, (n_hit * 1000) // n_sh AS contamination_pm
          |FROM sizes JOIN hits ON sizes.doc_id = hits.doc_id
          |ORDER BY sizes.doc_id""".stripMargin
    )
  }
}
