package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Round-7 wave: privacy audit.
 *
 *  - k_anonymity_ladder: k-anonymity of the corpus under quasi-
 *    identifiers (lang, source, doc-length bucket), evaluated across a
 *    LADDER of generalization widths (50/100/200/400 chars per bucket).
 *    A class with fewer than k=5 members re-identifies its documents;
 *    the ladder shows how much generalization buys compliance — the
 *    audit a dataset release runs before publishing metadata. One
 *    grouped aggregation per width over the same scan; widths are a
 *    4-element union, not a parameter sweep of jobs.
 */
object ExtQueries27 {

  private val K = 5
  private val Widths = Seq(50, 100, 200, 400)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "k_anonymity_ladder" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      val perWidth = Widths.map { wdt =>
        d.select(col("lang"), col("source"),
            expr(s"n_chars DIV $wdt").as("len_bucket"))
          .groupBy(col("lang"), col("source"), col("len_bucket"))
          .agg(count(lit(1)).as("n"))
          .agg(
            count(lit(1)).as("n_classes"),
            sum(when(col("n") < K, 1L).otherwise(0L)).as("at_risk_classes"),
            sum(when(col("n") < K, col("n")).otherwise(0L)).as("at_risk_docs"),
            min(col("n")).as("min_class_size"))
          .select(lit(wdt).as("bucket_width"), col("n_classes"),
            col("at_risk_classes"), col("at_risk_docs"), col("min_class_size"))
      }
      perWidth.reduce(_ unionAll _).orderBy(col("bucket_width"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "k_anonymity_ladder" -> Widths.map { wdt =>
      s"""SELECT ${wdt} AS bucket_width, COUNT(*) AS n_classes,
         |       CAST(SUM(CASE WHEN n < ${K} THEN 1 ELSE 0 END) AS BIGINT) AS at_risk_classes,
         |       CAST(SUM(CASE WHEN n < ${K} THEN n ELSE 0 END) AS BIGINT) AS at_risk_docs,
         |       MIN(n) AS min_class_size
         |FROM (SELECT lang, source, n_chars // ${wdt} AS len_bucket, COUNT(*) AS n
         |      FROM documents GROUP BY lang, source, n_chars // ${wdt})""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY bucket_width")
  )
}
