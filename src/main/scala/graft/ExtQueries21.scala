package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Round-6 eleventh wave: optimizer-statistics shapes.
 *
 *  - join_cardinality: per-key histograms predict the equi-join output
 *    size WITHOUT materializing the join (sum over keys of
 *    count_a * count_b — the textbook cardinality-estimation identity,
 *    exact for equi-joins); the prediction is then verified against the
 *    materialized join's count. At 100 TB the histogram form is how a
 *    planner (or a pipeline pre-flight check) sizes a join: two
 *    key-grouped counts and a key-sized join, never the joined fact
 *    rows.
 */
object ExtQueries21 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "join_cardinality" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_o"))
      val c = Tables.table(s, dir, "customer")
        .groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("n_c"))
      val predicted = o.join(c, "k")
        .agg(sum(col("n_o") * col("n_c")).as("predicted"))
      val actual = Tables.table(s, dir, "orders")
        .join(Tables.table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("actual"))
      predicted.crossJoin(actual)
        .select(col("predicted"), col("actual"),
          (col("predicted") === col("actual")).as("exact_match"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "join_cardinality" ->
      """WITH o AS (SELECT o_custkey AS k, COUNT(*) AS n_o FROM orders GROUP BY o_custkey),
        |c AS (SELECT c_custkey AS k, COUNT(*) AS n_c FROM customer GROUP BY c_custkey),
        |p AS (SELECT CAST(SUM(n_o * n_c) AS BIGINT) AS predicted FROM o JOIN c ON o.k = c.k),
        |a AS (SELECT COUNT(*) AS actual FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT predicted, actual, predicted = actual AS exact_match
        |FROM p CROSS JOIN a""".stripMargin
  )
}
