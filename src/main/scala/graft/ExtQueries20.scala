package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex, DeterministicSample, Tables}

/**
 * Round-6 tenth wave: split hygiene.
 *
 *  - dedup_word_bag:      normalization-aware exact dedup — docs equal
 *                         as word MULTISETS (reordered content) group
 *                         together even when raw bytes differ.
 *  - split_leakage_audit: near-dup pairs crossing train/val/test split
 *                         boundaries — the train-test-contamination
 *                         measurement eval hygiene requires.
 *  - split_leakage_repair: reassign whole near-dup groups to their
 *                         canonical doc's split so no cross-split pair
 *                         survives (the fix the audit motivates).
 */
object ExtQueries20 {

  private val ValPct = 10
  private val TestPct = 10

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bag-of-words exact dedup: normalize each doc to its sorted word
    // multiset and group on the normalized hash — catches reordered
    // near-copies that byte-exact dedup misses, at byte-exact cost (one
    // scan + one 16-byte-key shuffle; the sort is per-row, bounded by
    // doc length). n_variants counts distinct raw texts inside a group:
    // > 1 means the group exists BECAUSE of normalization.
    "dedup_word_bag" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          md5(array_join(array_sort(split(col("text"), " ")), " ")).as("bag_hash"))
        .groupBy(col("bag_hash"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_variants"),
          min(col("doc_id")).as("keep_doc"))
        .where(col("n_docs") >= 2)
        .orderBy(col("bag_hash"))),

    // Train/test contamination audit: SimHash near-dup pairs (hamming
    // <= 3 — the dedup_groups_cc pair set) classified by the splits of
    // their endpoints. Cross-split rows ARE the leakage: a test doc
    // whose near-copy sits in train inflates eval. Pair volume is the
    // banded join's (bounded); the split map is a pure hash of doc_id,
    // so the audit adds only projections and one small aggregation.
    "split_leakage_audit" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val splits = DeterministicSample.split(docs.select(col("doc_id")),
        col("doc_id").cast("string"), ValPct, TestPct)
      val pairs = DedupIndex.simhashPairs(s, dir, 3)
      pairs
        .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
        .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("split_lo"),
          greatest(col("sa"), col("sb")).as("split_hi"))
        .groupBy(col("split_lo"), col("split_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("is_leak", col("split_lo") =!= col("split_hi"))
        .orderBy(col("split_lo"), col("split_hi"))
    }),

    // Leakage repair: connected near-dup groups move WHOLE to the split
    // of their canonical member (the component id = min doc id), so no
    // near-dup pair can straddle a boundary afterwards. Docs outside
    // any pair keep their hash-assigned split. The reassignment is a
    // pure function of (doc_id, component), so any engine lands on the
    // same new split map; Ext20Spec re-runs the audit on the repaired
    // assignment and asserts zero cross-split pairs.
    "split_leakage_repair" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val splits = DeterministicSample.split(docs.select(col("doc_id")),
        col("doc_id").cast("string"), ValPct, TestPct)
      val comps = DedupIndex.simhashComponents(s, dir, 3)
        .select(col("node").as("doc_id"), col("comp"))
      val compSplit = DeterministicSample.split(
        comps.select(col("comp")).distinct(),
        col("comp").cast("string"), ValPct, TestPct)
        .select(col("comp"), col("split").as("comp_split"))
      splits.join(comps, Seq("doc_id"), "left")
        .join(compSplit, Seq("comp"), "left")
        .select(col("doc_id"), col("split").as("old_split"),
          coalesce(col("comp_split"), col("split")).as("new_split"))
        .withColumn("moved", col("old_split") =!= col("new_split"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "dedup_word_bag" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |         md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bag_hash
        |  FROM documents)
        |SELECT bag_hash, COUNT(*) AS n_docs,
        |       COUNT(DISTINCT text) AS n_variants, MIN(doc_id) AS keep_doc
        |FROM n GROUP BY bag_hash HAVING COUNT(*) >= 2
        |ORDER BY bag_hash""".stripMargin,

    "split_leakage_audit" -> {
      val sa = DeterministicSample.splitCaseSql("CAST(p.doc_a AS VARCHAR)", ValPct, TestPct)
      val sb = DeterministicSample.splitCaseSql("CAST(p.doc_b AS VARCHAR)", ValPct, TestPct)
      s"""WITH ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |cls AS (
         |  SELECT LEAST($sa, $sb) AS split_lo,
         |         GREATEST($sa, $sb) AS split_hi
         |  FROM sel p)
         |SELECT split_lo, split_hi, COUNT(*) AS n_pairs,
         |       split_lo <> split_hi AS is_leak
         |FROM cls GROUP BY split_lo, split_hi
         |ORDER BY split_lo, split_hi""".stripMargin
    },

    "split_leakage_repair" -> {
      val old = DeterministicSample.splitCaseSql("CAST(d.doc_id AS VARCHAR)", ValPct, TestPct)
      val cs = DeterministicSample.splitCaseSql("CAST(c.comp AS VARCHAR)", ValPct, TestPct)
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
         |comp AS (SELECT node AS doc_id, MIN(lab) AS comp FROM reach GROUP BY node)
         |SELECT d.doc_id, $old AS old_split,
         |       CASE WHEN c.doc_id IS NULL THEN $old ELSE $cs END AS new_split,
         |       CASE WHEN c.doc_id IS NULL THEN false ELSE $cs <> $old END AS moved
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }
  )
}
