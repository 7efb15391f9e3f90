package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix (running) aggregation over a TOTAL order — the
 * scalable form of `Window.orderBy(...)` without a partition spec, which
 * Spark executes by moving ALL rows to a single partition (the
 * "No Partition Defined for Window operation" path — a non-starter at
 * 100 TB).
 *
 * Classic two-level scan:
 *   1. range-partition by the order column (so partition i holds a
 *      contiguous key range, all keys < partition i+1's);
 *   2. per-partition running aggregate via a Window PARTITIONED by
 *      spark_partition_id() (parallel, no global funnel);
 *   3. per-partition totals (#partitions rows — tiny) get an exclusive
 *      running aggregate on the driver-scale side and are broadcast back;
 *   4. combine: running = combine(partition-local running, exclusive
 *      partition prefix).
 *
 * Reference mapping: the ascending-watermark late-data filter
 * (ItemInteractionCounterTwoInputStreamOperator.java:75-77 — an event is
 * late iff an earlier-arrived event carried ts >= its own) is a prefix
 * MAX over arrival order; in streaming Spark the watermark mechanism
 * does this natively, and this operator is the batch equivalent.
 */
object PrefixScan {

  /**
   * Exclusive running max of `valueCol` over ascending `orderCol`
   * (distinct values assumed — a total order). Adds `outCol`; null for
   * the first row (empty prefix). Plan: one range shuffle + one
   * partition-parallel window + one broadcast join; the only
   * single-partition window runs over #partitions rows.
   */
  def runningMaxExclusive(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val withPid = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())

    // per-partition max -> exclusive prefix per partition (tiny: one row
    // per partition; partitionBy(lit(0)) keeps WindowExec off the
    // all-to-one warning path while staying a deliberate 1-partition op)
    val prefixes = withPid
      .groupBy(col("__pid"))
      .agg(max(col(valueCol)).as("__pmax"))
      .withColumn("__prefix",
        max(col("__pmax")).over(
          Window.partitionBy(lit(0)).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__prefix"))

    val local = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)

    withPid
      .join(broadcast(prefixes), Seq("__pid"))
      .withColumn("__local", max(col(valueCol)).over(local))
      // greatest() skips nulls: null only when both prefix parts are null
      .withColumn(outCol, greatest(col("__local"), col("__prefix")))
      .drop("__pid", "__local", "__prefix")
  }
}
