package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Tables

/**
 * Round-7 wave: RFM segmentation — the classic per-entity
 * recency/frequency/monetary quantile cube (here over the events
 * stream's users). Each dimension is scored into quintiles with ntile
 * over a fully tie-broken order (engine-portable, cf. calibration_bins);
 * the output is the segment cube with user counts and value mass —
 * two grouped aggregations and three windows over one user-keyed
 * shuffle, no joins against the fact table.
 */
object ExtQueries28 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "rfm_segments" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val perUser = ev
        .groupBy(col("user_id"))
        .agg(
          max(expr("unix_micros(ts)")).as("last_us"),
          count(lit(1)).as("freq"),
          sum(col("value").cast(DecimalType(20, 4))).as("money"))
      val withRec = perUser
        .crossJoin(broadcast(ev.agg(max(expr("unix_micros(ts)")).as("max_us"))))
        .withColumn("rec_days", expr("(max_us - last_us) DIV 86400000000"))
      // Quintiles via the distributed two-level-scan NTILE (bit-equal to
      // the oracle's NTILE windows but never funnels the user-cardinality
      // ranked set into one partition). DESC orders become ascending
      // negated columns; one localCheckpoint bounds the re-scans the
      // three quantile passes would otherwise trigger on the events agg.
      val base = withRec
        .withColumn("__negf", -col("freq"))
        .withColumn("__negm", negate(col("money")))
        .localCheckpoint()
      val seg = Seq(("rec_days", "r_seg"), ("__negf", "f_seg"), ("__negm", "m_seg"))
        .foldLeft(base) { case (d, (oc, out)) =>
          graft.operators.PrefixScan.ntileDistributed(d, oc, Seq("user_id"), 5, out)
        }
      seg.groupBy(col("r_seg"), col("f_seg"), col("m_seg"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("freq")).as("n_events"),
          sum(col("money")).cast(DecimalType(38, 2)).cast("double").as("sum_value"))
        .orderBy(col("r_seg"), col("f_seg"), col("m_seg"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "rfm_segments" ->
      """WITH u AS (
        |  SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS freq,
        |         SUM(CAST(value AS DECIMAL(20,4))) AS money
        |  FROM events GROUP BY user_id),
        |m AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
        |r AS (SELECT u.*, (max_us - last_us) // 86400000000 AS rec_days
        |      FROM u CROSS JOIN m),
        |seg AS (
        |  SELECT user_id, freq, money,
        |         NTILE(5) OVER (ORDER BY rec_days, user_id) AS r_seg,
        |         NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_seg,
        |         NTILE(5) OVER (ORDER BY money DESC, user_id) AS m_seg
        |  FROM r)
        |SELECT r_seg, f_seg, m_seg, COUNT(*) AS n_users,
        |       CAST(SUM(freq) AS BIGINT) AS n_events,
        |       CAST(CAST(SUM(money) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
        |FROM seg GROUP BY r_seg, f_seg, m_seg
        |ORDER BY r_seg, f_seg, m_seg""".stripMargin
  )
}
