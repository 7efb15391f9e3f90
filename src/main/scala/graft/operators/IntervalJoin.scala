package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bin-blocked interval overlap join — the scale path for joining two
 * interval sets on `overlaps` (no equi key): assigning every interval
 * to its covered fixed-width bins turns the quadratic theta join into
 * an equi-join on bin, with fan-out |interval| / binWidth per row.
 *
 * Each overlapping pair is emitted EXACTLY ONCE without a distinct():
 * a pair only materializes in its canonical bin — max(bin(ls),
 * bin(rs)), the first bin where both intervals are live (both interval
 * bin ranges contain it iff the intervals overlap, and it is unique
 * per pair). A distinct() would re-shuffle the full pair output;
 * the canonical-bin filter is evaluated inside the joined stage.
 *
 * At 100 TB the bin width is the knob: width ~ median interval length
 * keeps the per-row fan-out at ~2 while keeping any one bin's
 * population (the join's hash bucket) bounded; AQE handles residual
 * bin skew. Intervals are half-open [s, e) over a non-negative long
 * domain (epoch days/seconds; DIV truncation = floor there).
 */
object IntervalJoin {

  /** Row-level guard: intervals must be NON-EMPTY (`s < e`). Spark's
    * `sequence(start, stop)` defaults to step -1 when start > stop, so a
    * malformed interval (e << s) would silently generate an unbounded
    * descending bin fan-out instead of failing — raise eagerly instead.
    * Expressed as a filter disjunct (not a projected assert_true column,
    * which column pruning could silently drop). */
  private def requireNonEmpty(s: String, e: String) =
    col(s) < col(e) ||
      // NULL bounds take this branch too (null < x is NULL, not true) —
      // say so in the message, and coalesce the formatted values so a
      // null bound can't null out the whole concat (r5 advice)
      raise_error(concat(
        lit(s"IntervalJoin.overlapBinned: empty, inverted, or null interval ($s >= $e or NULL bound) at $s="),
        coalesce(col(s).cast("string"), lit("null")),
        lit(s", $e="), coalesce(col(e).cast("string"), lit("null")),
        lit("; intervals must be non-empty half-open [s, e) with non-null bounds"))).isNotNull

  /**
   * left must carry (ls, le), right (rs, re); all other columns are
   * passed through. Both e exclusive, all values >= 0, and every
   * interval non-empty (s < e) — empty/inverted intervals raise.
   */
  def overlapBinned(left: DataFrame, right: DataFrame, binWidth: Long): DataFrame = {
    val lb = left.where(requireNonEmpty("ls", "le")).withColumn("__bin",
      explode(sequence(expr(s"ls DIV $binWidth"), expr(s"(le - 1) DIV $binWidth"))))
    val rb = right.where(requireNonEmpty("rs", "re")).withColumn("__bin",
      explode(sequence(expr(s"rs DIV $binWidth"), expr(s"(re - 1) DIV $binWidth"))))
    lb.join(rb, "__bin")
      .where(col("ls") < col("re") && col("rs") < col("le") &&
        col("__bin") === greatest(expr(s"ls DIV $binWidth"), expr(s"rs DIV $binWidth")))
      .drop("__bin")
  }
}
