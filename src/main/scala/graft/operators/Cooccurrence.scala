package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.LogLikelihood.llr

/**
 * Batch (skip-cuts) item-based co-occurrence + LLR top-K — the engine's
 * flagship pipeline, re-derived relationally from the reference dataflow
 * (reference: FlinkCooccurrences.java:36-182).
 *
 * Semantics (reference: UserInteractionCounterOneInputStreamOperator.java:167-205,
 * append path with unbounded history = NonSampled variant :113-165):
 * every pair of interaction events by the same user contributes +1 to
 * C[i][j] AND +1 to C[j][i]; two events on the same item contribute +2 to
 * C[i][i] per unordered pair. Hence, with n_u(i) = #events of user u on
 * item i:
 *
 *   C[i][j] = Σ_u n_u(i)·n_u(j)        (i ≠ j)
 *   C[i][i] = Σ_u n_u(i)·(n_u(i) − 1)
 *
 * rowSum R[i] = Σ_j C[i][j]; total = Σ_i R[i]
 * (reference: ItemRowRescorerTwoInputStreamOperator.java:144-156).
 *
 * Scoring (reference: ItemRowRescorerTwoInputStreamOperator.java:230-241):
 *   k11 = C[i][j], k12 = R[i]−k11, k21 = R[j]−k11,
 *   k22 = total + k11 − k12 − k21, score = LLR(k11,k12,k21,k22),
 * then top-K per item (reference: IntDoublePriorityQueue.java).
 *
 * Scale notes (100 TB posture):
 *  - We NEVER self-join raw events. The per-user item histogram
 *    (`user, item, n`) is aggregated first (map-side partial agg), so the
 *    pair join fans out per-user *distinct items* squared — which the kMax
 *    user cut bounds at ≤ kMax² per user (Sampling.scala).
 *  - rowSums / total are tiny (one row per item) → broadcast, never shuffled
 *    against the pair table.
 *  - top-K per item uses a bounded heap aggregator or a window-rank over
 *    the (item) partitioning already produced by the pair aggregation.
 */
object Cooccurrence {

  /** Parse the driver's `events` table into the reference's interaction
    * schema `(user, item, ts)` (reference: FlinkCooccurrences.java:207-219 —
    * there a CSV line split; here the item id rides in the JSON props). */
  def interactions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("user_id").cast("int").as("user"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        col("ts"))

  /** Per-user item histogram — the only aggregation over raw events. */
  def perUserItemCounts(interactions: DataFrame): DataFrame =
    interactions.groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))

  /** Sparse co-occurrence matrix C as (item, other, cnt) rows, cnt > 0. */
  def coocCounts(interactions: DataFrame): DataFrame = {
    val pu = perUserItemCounts(interactions)
    val a = pu.as("a")
    val b = pu.as("b")
    a.join(b, "user")
      .select(
        col("a.item").as("item"),
        col("b.item").as("other"),
        when(col("a.item") === col("b.item"), col("a.n") * (col("a.n") - 1))
          .otherwise(col("a.n") * col("b.n")).as("c"))
      .groupBy(col("item"), col("other"))
      .agg(sum(col("c")).as("cnt"))
      .where(col("cnt") > 0)
  }

  /** Row sums R[i] of the co-occurrence matrix. */
  def rowSums(cooc: DataFrame): DataFrame =
    cooc.groupBy(col("item")).agg(sum(col("cnt")).as("row_sum"))

  /**
   * Full pipeline: LLR-scored top-K most similar items per item.
   * Output: (item, rnk, other, score) with score rounded to 4 decimals and
   * rank deterministic (rounded-score desc, other asc) so results are
   * reproducible across partitionings and engines.
   */
  def llrTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val cooc = coocCounts(interactions(spark, dir))
    llrTopKFromCounts(cooc, k)
  }

  def llrTopKFromCounts(cooc: DataFrame, k: Int): DataFrame = {
    val scored = llrScores(cooc)
    val w = Window.partitionBy(col("item"))
      .orderBy(col("score").desc, col("other").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("item"), col("rnk"), col("other"), col("score"))
      .orderBy(col("item"), col("rnk"))
  }

  /**
   * PMI-scored top-K: pointwise mutual information
   * ln(total * cnt / (rowSum_i * rowSum_j)) over the same sparse C matrix
   * — demonstrates the rescorer slot is pluggable (same sums-before-
   * scoring shape as LLR, different score). Broadcast row sums + scalar
   * total, partitioned window rank — identical plan posture to llrTopK.
   */
  def pmiTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val cooc = coocCounts(interactions(spark, dir))
    val rs = rowSums(cooc)
    val totalDf = cooc.agg(sum(col("cnt")).as("total"))
    val scored = cooc
      .join(broadcast(rs.withColumnRenamed("item", "i").withColumnRenamed("row_sum", "row_sum_i")),
        col("item") === col("i"))
      .join(broadcast(rs.withColumnRenamed("item", "o").withColumnRenamed("row_sum", "row_sum_o")),
        col("other") === col("o"))
      .join(broadcast(totalDf))
      .select(col("item"), col("other"),
        round(log(col("cnt").cast("double") * col("total").cast("double") /
          (col("row_sum_i").cast("double") * col("row_sum_o").cast("double"))), 4)
          .as("score"))
    val w = Window.partitionBy(col("item")).orderBy(col("score").desc, col("other").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("item"), col("rnk"), col("other"), col("score"))
      .orderBy(col("item"), col("rnk"))
  }

  /** LLR score for every non-zero cell of the co-occurrence matrix.
    * rowSums and the scalar total are broadcast — they are one row per item. */
  def llrScores(cooc: DataFrame): DataFrame = {
    val rs = rowSums(cooc)
    // scalar total as a broadcast single-row frame (no driver collect in-plan)
    val totalDf = cooc.agg(sum(col("cnt")).as("total"))
    val withSums = cooc
      .join(broadcast(rs.withColumnRenamed("item", "i").withColumnRenamed("row_sum", "row_sum_i")),
        col("item") === col("i"))
      .join(broadcast(rs.withColumnRenamed("item", "o").withColumnRenamed("row_sum", "row_sum_o")),
        col("other") === col("o"))
      .join(broadcast(totalDf))
    val k11 = col("cnt")
    val k12 = col("row_sum_i") - k11
    val k21 = col("row_sum_o") - k11
    val k22 = col("total") + k11 - k12 - k21 // reference's exact formula (ItemRowRescorer...java:236-239)
    withSums.select(
      col("item"), col("other"),
      round(llr(k11.cast("long"), k12.cast("long"), k21.cast("long"), k22.cast("long")), 4)
        .as("score"))
  }
}
