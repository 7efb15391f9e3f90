package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex, Tables}

/**
 * Round-7 wave: dedup-structure reporting — the summary views a
 * curation team actually reads after a dedup run.
 *
 *  - dedup_cluster_stats: the duplicate-cluster size distribution
 *    (from the same SimHash-pairs → connected-components machinery as
 *    dedup_groups_cc) — how much of the corpus sits in how-large
 *    clusters; the histogram is cluster-size-bounded.
 *  - dup_ratio_by_source: near-dup membership rate per source — the
 *    "which feeds are spammy" signal; one join of the CC node set
 *    against doc metadata.
 *  - text_ngram_novelty: novelty curve over ingestion order — per
 *    100-doc ingestion chunk, the fraction of its distinct 5-gram
 *    shingles never seen in an earlier chunk (first-occurrence = a
 *    min-aggregate per shingle, no cross-chunk scan).
 */
object ExtQueries34 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_cluster_stats" -> ((s, dir) => {
      val comps = DedupIndex.simhashComponents(s, dir, 3)
      comps.groupBy(col("comp")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
        .select(col("size"), col("n_clusters"),
          (col("size") * col("n_clusters")).as("n_docs"))
        .orderBy(col("size"))
    }),

    "dup_ratio_by_source" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      // Membership = the cluster index's node set (a doc appears in some
      // near-dup pair iff it carries a component label), so this is a
      // free scan of the memoized index rather than a pair rebuild.
      val members = DedupIndex.simhashComponents(s, dir, 3)
        .select(col("node").as("doc_id"))
      docs.join(members.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_members"))
        .select(col("source"), col("n_docs"), col("n_dup_members"),
          expr("(n_dup_members * 1000000) DIV n_docs").as("dup_ppm"))
        .orderBy(col("source"))
    }),

    "text_ngram_novelty" -> ((s, dir) => {
      val sh = Dedup.ngramShingles(Tables.table(s, dir, "documents"), 5)
        .select(expr("doc_id DIV 100").as("chunk"), col("shingle")).distinct()
      val firstSeen = sh.groupBy(col("shingle")).agg(min(col("chunk")).as("first_chunk"))
      sh.join(firstSeen, "shingle")
        .groupBy(col("chunk"))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("first_chunk") === col("chunk"), 1L).otherwise(0L)).as("n_new"))
        .select(col("chunk"), col("n_sh"), col("n_new"),
          expr("(n_new * 1000) DIV n_sh").as("novelty_pm"))
        .orderBy(col("chunk"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM sel
         |      UNION SELECT doc_b, doc_a FROM sel),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node),
         |comps AS (SELECT node, MIN(lab) AS comp FROM reach GROUP BY node),
         |sizes AS (SELECT comp, COUNT(*) AS sz FROM comps GROUP BY comp)
         |SELECT sz AS size, COUNT(*) AS n_clusters,
         |       CAST(sz * COUNT(*) AS BIGINT) AS n_docs
         |FROM sizes GROUP BY sz ORDER BY size""".stripMargin,

    "dup_ratio_by_source" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |members AS (SELECT DISTINCT doc_a AS doc_id FROM sel
         |            UNION SELECT DISTINCT doc_b FROM sel)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN documents.doc_id IN (SELECT doc_id FROM members)
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_members,
         |       (CAST(SUM(CASE WHEN documents.doc_id IN (SELECT doc_id FROM members)
         |                      THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |         // COUNT(*) AS dup_ppm
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "text_ngram_novelty" ->
      """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id // 100 AS chunk,
        |          w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
        |        FROM wd, UNNEST(range(1, len(w) - 3)) r(i)),
        |fs AS (SELECT shingle, MIN(chunk) AS first_chunk FROM sh0 GROUP BY shingle)
        |SELECT chunk, COUNT(*) AS n_sh,
        |       CAST(SUM(CASE WHEN first_chunk = chunk THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |       (CAST(SUM(CASE WHEN first_chunk = chunk THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |         // COUNT(*) AS novelty_pm
        |FROM sh0 JOIN fs ON sh0.shingle = fs.shingle
        |GROUP BY chunk ORDER BY chunk""".stripMargin
  )
}
