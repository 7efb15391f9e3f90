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
 *   1. bucket rows by VALUE-RANGE: boundaries come from one
 *      approxQuantile pass, collected to the driver and embedded as
 *      literals, so the bucket id is a PURE FUNCTION of the order value
 *      (boundary quality affects only balance, never correctness — no
 *      reliance on exchange reuse or consistent physical partition ids
 *      across plan branches);
 *   2. per-bucket running aggregate via a Window PARTITIONED by the
 *      bucket id (parallel, no global funnel);
 *   3. per-bucket totals (#buckets rows — tiny) get an exclusive
 *      running aggregate and are broadcast back;
 *   4. combine: running = combine(bucket-local running, exclusive
 *      bucket prefix).
 *
 * Reference mapping: the ascending-watermark late-data filter
 * (ItemInteractionCounterTwoInputStreamOperator.java:75-77 — an event is
 * late iff an earlier-arrived event carried ts >= its own) is a prefix
 * MAX over arrival order; in streaming Spark the watermark mechanism
 * does this natively, and this operator is the batch equivalent.
 */
object PrefixScan {

  /**
   * Shared two-level-scan scaffolding: value-range bucket ids from one
   * approxQuantile pass, the per-bucket driver-side exclusive fold, and
   * the broadcast-back combine. `orderCol` must be a UNIQUE total order
   * (e.g. a key column): with duplicate order values the exclusive
   * prefix AMONG tied rows depends on arbitrary intra-partition order
   * and the result is not partition-independent.
   */
  private def twoLevelScan(df: DataFrame, orderCol: String,
      bucketAgg: Column => Column,
      driverFold: Iterator[org.apache.spark.sql.Row] => Array[org.apache.spark.sql.Row],
      prefixField: org.apache.spark.sql.types.StructField,
      combine: (Column, Column) => Column,
      valueCol: String, outCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds: Array[Double] =
      if (probs.isEmpty) Array.empty
      else df.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // bucket id = #boundaries strictly below the value — a flat codegen
    // sum of comparisons against literals
    val pid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0)
    }
    val withPid = df.withColumn("__pid", pid)

    // per-bucket aggregate -> exclusive prefix per bucket. One row per
    // bucket (<= shuffle.partitions), so the exclusive scan runs on the
    // DRIVER — the canonical two-level-scan step — instead of a
    // 1-partition WindowExec (Catalyst folds a literal partition key
    // away, which lands on the all-to-one "No Partition Defined" path).
    val bucketAggDf = withPid
      .groupBy(col("__pid"))
      .agg(bucketAgg(col(valueCol)).as("__pagg"))
    val rows = bucketAggDf.collect().sortBy(_.getInt(0))
    val prefixRows = driverFold(rows.iterator)
    val prefixSchema = org.apache.spark.sql.types.StructType(Seq(
      bucketAggDf.schema("__pid"), prefixField))
    val prefixes = spark.createDataFrame(
      spark.sparkContext.parallelize(prefixRows.toIndexedSeq, 1), prefixSchema)

    // Ties on orderCol never straddle buckets (the bucket id is a pure
    // function of the VALUE), so a within-bucket tiebreak is enough to
    // make the scan a total order even when orderCol alone has duplicates.
    val local = Window.partitionBy(col("__pid"))
      .orderBy((orderCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)

    withPid
      .join(broadcast(prefixes), Seq("__pid"))
      .withColumn(outCol, combine(bucketAgg(col(valueCol)).over(local), col("__prefix")))
      .drop("__pid", "__prefix")
  }

  /**
   * Exclusive running max of `valueCol` over ascending `orderCol` (a
   * UNIQUE numeric total order — see twoLevelScan). Adds `outCol`; null
   * for the first row (empty prefix). Plan: one quantile pass + one
   * bucket-parallel window + one broadcast join; the only
   * single-partition step runs over #buckets rows on the driver.
   */
  def runningMaxExclusive(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame =
    twoLevelScan(df, orderCol,
      bucketAgg = max,
      driverFold = { rows =>
        var run: Any = null
        rows.map { r =>
          val out = org.apache.spark.sql.Row(r.getInt(0), run)
          val v = r.get(1)
          if (v != null && (run == null ||
              run.asInstanceOf[Comparable[Any]].compareTo(v) < 0)) run = v
          out
        }.toArray
      },
      prefixField = org.apache.spark.sql.types.StructField("__prefix",
        df.schema(valueCol).dataType, nullable = true),
      // greatest() skips nulls: null only when both prefix parts are null
      combine = (local, prefix) => greatest(local, prefix),
      valueCol = valueCol, outCol = outCol)

  /**
   * Exclusive running SUM of integral `valueCol` over ascending UNIQUE
   * `orderCol` — same two-level scan as runningMaxExclusive. Adds
   * `outCol` as BIGINT; 0 for the first row (an empty prefix sums to 0).
   * The building block for sequential token-budget packing and offset
   * assignment at corpus scale.
   */
  def runningSumExclusive(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val prepared = df.withColumn("__v", col(valueCol).cast("long"))
    twoLevelScan(prepared, orderCol,
      bucketAgg = sum,
      driverFold = { rows =>
        var run = 0L
        rows.map { r =>
          val out = org.apache.spark.sql.Row(r.getInt(0), run)
          if (!r.isNullAt(1)) run += r.getLong(1)
          out
        }.toArray
      },
      prefixField = org.apache.spark.sql.types.StructField("__prefix",
        org.apache.spark.sql.types.LongType, nullable = false),
      combine = (local, prefix) => coalesce(local, lit(0L)) + prefix,
      valueCol = "__v", outCol = outCol,
      tieCols = tieCols)
      .drop("__v")
  }

  /**
   * Distributed NTILE(k) over ascending (orderCol, tieCols…) — bit-equal
   * to SQL `NTILE(k) OVER (ORDER BY orderCol, tieCols…)` on the same
   * total order, WITHOUT the all-to-one unpartitioned WindowExec (which
   * moves every row to one partition — a non-starter when the ranked set
   * is user- or document-cardinality). Row numbers come from the
   * two-level prefix scan (bucket-parallel); the total count is a 1-row
   * broadcast; the tile id is the closed-form NTILE bucket function of
   * (rn, N, k): the first N mod k tiles take ⌈N/k⌉ rows, the rest ⌊N/k⌋.
   * Adds `outCol` as INT (matching `ntile()`'s type).
   */
  def ntileDistributed(df: DataFrame, orderCol: String, tieCols: Seq[String],
      k: Int, outCol: String): DataFrame = {
    val rn = runningSumExclusive(
      df.withColumn("__one", lit(1L)), orderCol, "__one", "__rn0", tieCols)
      .withColumn("__rn", col("__rn0") + 1)
    val total = df.groupBy().agg(count(lit(1)).as("__n"))
    rn.crossJoin(broadcast(total))
      .withColumn(outCol, expr(
        s"""CAST(CASE WHEN __rn <= (__n % $k) * ((__n DIV $k) + 1)
           |     THEN ((__rn - 1) DIV ((__n DIV $k) + 1)) + 1
           |     ELSE (__n % $k)
           |          + ((__rn - (__n % $k) * ((__n DIV $k) + 1) - 1)
           |             DIV greatest(__n DIV $k, 1)) + 1
           |     END AS INT)""".stripMargin))
      .drop("__one", "__rn0", "__rn", "__n")
  }
}
