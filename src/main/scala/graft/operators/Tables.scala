package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table access for the driver testdata. */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /**
   * The events table carries TIMESTAMP(NANOS) which Spark's parquet reader
   * rejects. Read nanos as long (legacy flag) and convert to a microsecond
   * timestamp with *integer* arithmetic — epoch-nanos (~1.7e18) overflows a
   * double's 53-bit mantissa, so `DIV` not `/`.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () } // already set or immutable: proceed
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
