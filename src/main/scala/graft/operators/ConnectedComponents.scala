package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected pair list — the operator that
 * turns near-duplicate PAIRS (MinHash/SimHash/embedding verdicts) into
 * duplicate GROUPS with one canonical representative, the final step of
 * every web-scale dedup pipeline ("keep min doc_id per component").
 *
 * Algorithm: iterative min-label propagation. Every node starts labeled
 * with itself; each round every node takes the min of its own label and
 * its neighbors' labels; fixpoint when no label changes. Rounds needed =
 * graph diameter — near-dup components are near-cliques (every member
 * pairs with most others), so 2-3 rounds in practice. For adversarial
 * long-chain graphs the alternating large-star/small-star algorithm
 * (Kiveris et al., "Connected Components in MapReduce and Beyond")
 * converges in O(log n) rounds with the same per-round join shape —
 * the propagation step below is the building block either way.
 *
 * Scale posture (100 TB): each round is one shuffle of the edge list
 * joined against the label table (both keyed by node id) plus a
 * min-aggregate; labels are localCheckpointed per round (lineage stays
 * depth-1, same discipline as the sampling window loop) with carried
 * stats dropped (StatsBridge). Edge and label tables are hash-partitioned
 * by node — AQE broadcasts the label side while it fits.
 *
 * Reference tie-in: the reference has no graph operator; this extends
 * SURVEY §2.2's dedup family (training-pipeline extension).
 */
object ConnectedComponents {

  /**
   * (node, comp) for every node appearing in `pairs` (columns doc_a,
   * doc_b); comp = min node id reachable — deterministic.
   */
  def components(pairs: DataFrame, maxIters: Int = 100): DataFrame = {
    val half = pairs.select(col("doc_a").cast("long").as("src"),
      col("doc_b").cast("long").as("dst"))
    val edges = half
      .unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = org.apache.spark.sql.graftbridge.StatsBridge.dropCarriedStats(
      edges.select(col("src").as("node")).distinct()
        .withColumn("comp", col("node"))
        .localCheckpoint(true))
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      // neighbor minimum per node: one keyed join + min-aggregate
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("comp").as("dst_comp")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("dst_comp")).as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"),
          coalesce(col("nbr_min") < col("comp"), lit(false)).as("chg"))
      // one eager job per round; carried-stats dropped so round w+1's
      // estimates don't compound on round w's (see StatsBridge)
      val ck = org.apache.spark.sql.graftbridge.StatsBridge.dropCarriedStats(
        next.localCheckpoint(true))
      changed = ck.where(col("chg")).count()
      labels = ck.select(col("node"), col("comp"))
      iters += 1
    }
    require(changed == 0, s"connected components did not converge in $maxIters rounds")
    edges.unpersist()
    labels
  }
}
