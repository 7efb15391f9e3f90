package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tables}

/**
 * Round-10 wave: incremental maintenance of the persisted dedup cluster
 * index — the missing half of the build-once/scan-many pattern
 * ([[graft.operators.DedupIndex]]). At 100 TB the index is built once
 * per corpus snapshot; every ingest batch afterwards must MERGE into it
 * without re-pairing the standing corpus against itself.
 *
 *  - dedup_index_refresh: an 80/20 base/incoming split of `documents`;
 *    the standing index is built on the base shard only, then
 *    [[Dedup.simhashComponentsRefresh]] merges the incoming shard —
 *    incoming x corpus banded candidates, CC over the TOUCHED contracted
 *    subgraph, label remap for merged components. The oracle is the FULL
 *    REBUILD's recursive-CC SQL over all documents: the incremental path
 *    must land on byte-identical cluster assignments.
 *  - dedup_minhash_refresh: the MinHash (unigram-Jaccard) twin through
 *    [[Dedup.minhashComponentsRefresh]], against its own full-rebuild
 *    oracle.
 */
object ExtQueries43 {

  private def isIncoming = col("doc_id") % 5 === 4 // 20% ingest shard

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_index_refresh" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = Dedup.simhashComponents(docs.where(!isIncoming), 3)
      Dedup.simhashComponentsRefresh(docs, isIncoming, 3, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    "dedup_minhash_refresh" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = Dedup.minhashComponents(docs.where(!isIncoming), 0.9)
      Dedup.minhashComponentsRefresh(docs, isIncoming, 0.9, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // the full-rebuild CC over ALL documents — identical to
    // dedup_groups_cc's oracle: incremental merge == rebuild
    "dedup_index_refresh" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM sel
         |      UNION SELECT doc_b, doc_a FROM sel),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(lab) AS comp FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin,

    // the MinHash twin, against ITS full-rebuild CC (unigram Jaccard)
    "dedup_minhash_refresh" ->
      s"""WITH RECURSIVE ${ExtQueries.minhashJoinCtes},
         |mp AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.9),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM mp
         |      UNION SELECT doc_b, doc_a FROM mp),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(lab) AS comp FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin
  )
}
