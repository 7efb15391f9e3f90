package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PortableHash, Tables, TextAnalysis}

/**
 * Round-7 capstone: the COMPOSED pretraining-corpus curation pipeline —
 * Gopher quality gate → word-bag dedup (keep-first) → benchmark
 * decontamination → per-source cap → token-budget selection — reported
 * as a per-stage attrition funnel (stage, n_docs, n_words). Each stage
 * is an operator the engine already ships individually, oracle-checked
 * on its own; the funnel's exact cardinalities pin the COMPOSITION
 * end-to-end in one hash-matched result.
 *
 * Scale shape: the survivors after the per-source cap are bounded by
 * cap × |sources|, so the budget cumsum's global window runs over a
 * candidate-bounded set (rrf_fusion discipline). The decontamination
 * survivors are localCheckpointed so the funnel's six branches don't
 * re-run the shingle semi-join.
 */
object ExtQueries35 {

  private val SourceCap = 15
  // budget = half the post-cap token mass (integer DIV)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "pipeline_pretrain_funnel" -> ((s, dir) => {
      val all = Tables.table(s, dir, "documents")
      val corpus = all.where(col("doc_id") % 10 =!= 3)
        .withColumn("n_words", size(split(col("text"), " ")).cast("long"))

      // s1: Gopher hard-threshold gate
      val gopherPass = TextAnalysis.gopherRules(corpus)
        .where(col("pass")).select(col("doc_id"))
      val s1 = corpus.join(gopherPass, "doc_id")

      // s2: word-bag dedup, keep-first
      val keepers = s1
        .withColumn("bag_hash", md5(array_join(array_sort(split(col("text"), " ")), " ")))
        .groupBy(col("bag_hash")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val s2 = s1.join(keepers, "doc_id")

      // s3: decontamination — drop docs sharing any 5-gram with the eval split
      val evalSh = Dedup.ngramShingles(all.where(col("doc_id") % 10 === 3), 5)
        .select(col("shingle")).distinct()
      val contaminated = Dedup.ngramShingles(s2, 5)
        .join(evalSh, Seq("shingle"), "left_semi")
        .select(col("doc_id")).distinct()
      val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint() // the expensive semi-join feeds 3 funnel branches

      // s4: per-source cap by portable-hash rank
      val wSrc = Window.partitionBy(col("source"))
        .orderBy(col("hv"), col("doc_id"))
      val s4 = s3
        .withColumn("hv", PortableHash.hMod(concat(lit("pf|"), col("doc_id").cast("string"))))
        .withColumn("rk", row_number().over(wSrc))
        .where(col("rk") <= SourceCap)

      // s5: greedy token-budget prefix in hash order (candidate-bounded:
      // survivors <= cap x |sources| after s4)
      val budget = s4.agg((sum(col("n_words")) / 2).cast("long").as("budget"))
      val wCum = Window.orderBy(col("hv"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val s5 = s4
        .withColumn("cum", sum(col("n_words")).over(wCum))
        .crossJoin(broadcast(budget))
        .where(col("cum") <= col("budget"))

      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_words")), lit(0L)).as("n_words"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_words"))
      stage("s0_corpus", corpus)
        .unionAll(stage("s1_gopher", s1))
        .unionAll(stage("s2_bag_dedup", s2))
        .unionAll(stage("s3_decontam", s3))
        .unionAll(stage("s4_source_cap", s4))
        .unionAll(stage("s5_token_budget", s5))
        .orderBy(col("stage"))
    })
  )

  def oracleSql: Map[String, String] = {
    val stop = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
    val stopList = s"[$stop]"
    val hv = PortableHash.hModSql("'pf|'||CAST(doc_id AS VARCHAR)")
    Map(
      "pipeline_pretrain_funnel" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text, source,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
           |  FROM documents WHERE doc_id % 10 <> 3),
           |gbase AS (
           |  SELECT doc_id, n_words,
           |         length(replace(text, ' ', '')) AS wchars,
           |         len(list_filter(string_split(text, ' '),
           |             w -> regexp_matches(w, '[a-z]'))) AS n_alpha_w,
           |         len(list_intersect(list_distinct(string_split(text, ' ')),
           |             $stopList)) AS stop_hits
           |  FROM corpus),
           |tf AS (SELECT doc_id, word, COUNT(*) AS c
           |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus)
           |       GROUP BY doc_id, word),
           |top AS (SELECT doc_id, MAX(c) AS top_cnt FROM tf GROUP BY doc_id),
           |s1 AS (
           |  SELECT c.* FROM corpus c
           |  JOIN gbase b ON c.doc_id = b.doc_id
           |  JOIN top t ON c.doc_id = t.doc_id
           |  WHERE (b.n_words BETWEEN 50 AND 100000)
           |    AND (ROUND(b.wchars * 1.0 / b.n_words, 4) BETWEEN 3.0 AND 10.0)
           |    AND ROUND(b.n_alpha_w * 1.0 / b.n_words, 4) >= 0.8
           |    AND b.stop_hits >= 2
           |    AND ROUND(t.top_cnt * 1.0 / b.n_words, 4) <= 0.2),
           |keep AS (
           |  SELECT MIN(doc_id) AS doc_id FROM (
           |    SELECT doc_id,
           |           md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bag_hash
           |    FROM s1) GROUP BY bag_hash),
           |s2 AS (SELECT s1.* FROM s1 JOIN keep ON s1.doc_id = keep.doc_id),
           |wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |sh AS (SELECT DISTINCT doc_id,
           |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
           |       FROM wd, UNNEST(range(1, len(w) - 3)) r(i)),
           |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 3),
           |bad AS (SELECT DISTINCT sh.doc_id FROM sh
           |        JOIN s2 ON sh.doc_id = s2.doc_id
           |        WHERE shingle IN (SELECT shingle FROM ev)),
           |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
           |ranked AS (
           |  SELECT *, $hv AS hv,
           |         ROW_NUMBER() OVER (PARTITION BY source
           |                            ORDER BY $hv, doc_id) AS rk
           |  FROM s3),
           |s4 AS (SELECT * FROM ranked WHERE rk <= $SourceCap),
           |b AS (SELECT CAST(SUM(n_words) AS BIGINT) // 2 AS budget FROM s4),
           |cum AS (
           |  SELECT *, SUM(n_words) OVER (ORDER BY hv, doc_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM s4),
           |s5 AS (SELECT cum.* FROM cum CROSS JOIN b WHERE cum.cum <= b.budget),
           |f AS (
           |  SELECT 's0_corpus' AS stage, COUNT(*) AS n_docs,
           |         CAST(COALESCE(SUM(n_words), 0) AS BIGINT) AS n_words FROM corpus
           |  UNION ALL SELECT 's1_gopher', COUNT(*),
           |         CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s1
           |  UNION ALL SELECT 's2_bag_dedup', COUNT(*),
           |         CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s2
           |  UNION ALL SELECT 's3_decontam', COUNT(*),
           |         CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s3
           |  UNION ALL SELECT 's4_source_cap', COUNT(*),
           |         CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s4
           |  UNION ALL SELECT 's5_token_budget', COUNT(*),
           |         CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s5)
           |SELECT stage, n_docs, n_words FROM f ORDER BY stage""".stripMargin
    )
  }
}
