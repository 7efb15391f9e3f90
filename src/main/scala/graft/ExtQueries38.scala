package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cooccurrence, Tables}

/**
 * Round-7 wave: graph structure statistics.
 *
 *  - graph_assortativity: the degree-assortativity coefficient of the
 *    item co-occurrence graph — Pearson correlation of endpoint
 *    degrees over the directed edge list (Newman 2002). Positive r:
 *    popular items co-occur with popular items (hub-clustering);
 *    negative: hub-and-spoke. All moments are exact integer sums
 *    (degrees are ints); the only float ops are the final division and
 *    two IEEE sqrts — identical sequences on both engines — rounded to
 *    the 1e-4 grid.
 */
object ExtQueries38 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "graph_assortativity" -> ((s, dir) => {
      val edges = Cooccurrence.coocCounts(Cooccurrence.interactions(s, dir))
        .where(col("item") =!= col("other"))
        .select(col("item"), col("other"))
      val deg = edges.groupBy(col("item")).agg(count(lit(1)).as("d"))
      val xy = edges
        .join(broadcast(deg.select(col("item"), col("d").as("x"))), "item")
        .join(broadcast(deg.select(col("item").as("other"), col("d").as("y"))), "other")
      // zero degree variance (a REGULAR graph — every item the same
      // degree, which the complete cooc graph at some SFs is) leaves r
      // undefined; emit 0.0 by convention on both engines
      xy.agg(count(lit(1)).as("n_edges"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("denx", col("n_edges") * col("sxx") - col("sx") * col("sx"))
        .withColumn("deny", col("n_edges") * col("syy") - col("sy") * col("sy"))
        .select(col("n_edges"),
          when(col("denx") > 0 && col("deny") > 0,
            round(
              (col("n_edges") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (sqrt(col("denx").cast("double")) * sqrt(col("deny").cast("double"))),
              4))
            .otherwise(lit(0.0)).as("assortativity"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "graph_assortativity" -> (SparkEntry.pairsSql +
      """, e AS (SELECT item, other FROM pairs WHERE item <> other),
        |deg AS (SELECT item, COUNT(*) AS d FROM e GROUP BY item),
        |xy AS (SELECT dx.d AS x, dy.d AS y FROM e
        |       JOIN deg dx ON e.item = dx.item
        |       JOIN deg dy ON e.other = dy.item),
        |m AS (SELECT COUNT(*) AS n_edges,
        |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |             CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
        |             CAST(SUM(x*y) AS BIGINT) AS sxy
        |      FROM xy),
        |d AS (SELECT *, n_edges * sxx - sx * sx AS denx,
        |              n_edges * syy - sy * sy AS deny FROM m)
        |SELECT n_edges,
        |       CASE WHEN denx > 0 AND deny > 0
        |            THEN ROUND(CAST(n_edges * sxy - sx * sy AS DOUBLE) /
        |                 (SQRT(CAST(denx AS DOUBLE)) * SQRT(CAST(deny AS DOUBLE))), 4)
        |            ELSE 0.0 END AS assortativity
        |FROM d""".stripMargin)
  )
}
