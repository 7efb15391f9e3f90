package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import PortableHash._

/**
 * Deterministic, partition-independent sampling for training-data
 * pipelines: membership is a pure function of the ROW KEY (portable
 * md5-derived hash, PortableHash), not of partition layout, executor
 * count, or iteration order.
 *
 * Contrast with `df.sample(fraction, seed)`: Spark's sample is seeded
 * per-partition, so the selected SET changes whenever partitioning
 * changes (repartition, AQE coalesce, input split sizing) — unusable as
 * a reproducible dataset-curation contract at 100 TB. Hash-gate
 * sampling gives the same selected set on any cluster, any layout, any
 * engine (the gate is reproducible in SQL — see PortableHash SQL
 * mirrors), at the cost of one md5 per row.
 *
 * Reference tie-in: the item cut / user reservoir (Sampling) bound
 * VOLUME per key with stateful semantics; these operators bound RATE
 * statelessly — the two compose (hash-gate first, cuts after).
 */
object DeterministicSample {

  /** keep iff H(key) mod 100 < pct — a deterministic Bernoulli(pct/100). */
  def bernoulli(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0,100]")
    df.where(hMod(key) % 100 < pct)
  }

  /** SQL mirror of the bernoulli gate (DuckDB dialect). */
  def bernoulliGateSql(keyE: String, pct: Int): String =
    s"(${hModSql(keyE)} % 100 < $pct)"

  /**
   * Per-ROW rate: keep iff H(key) mod 10000 < ratePermyriad — weighted
   * Bernoulli where the keep probability is a column (quality score,
   * length prior, ...). The rate rides an integer permyriad grid so
   * the gate is float-free and engine-portable.
   */
  def weighted(df: DataFrame, key: Column, ratePermyriad: Column): DataFrame =
    df.where(hMod(key) % 10000 < ratePermyriad)

  /** SQL mirror of the weighted gate (DuckDB dialect). */
  def weightedGateSql(keyE: String, rateE: String): String =
    s"(${hModSql(keyE)} % 10000 < $rateE)"

  /**
   * Per-stratum rates: keep iff H(key) mod 100 < rate(stratum). Rates
   * ride a broadcast join (tiny by construction); strata missing from
   * the map use defaultPct.
   */
  def stratified(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val spark = df.sparkSession
    val rateDf = spark.createDataFrame(rates.toSeq).toDF("__stratum", "__pct")
    df.join(broadcast(rateDf), stratum === col("__stratum"), "left_outer")
      .withColumn("__pct", coalesce(col("__pct"), lit(defaultPct)))
      .where(hMod(key) % 100 < col("__pct"))
      .drop("__stratum", "__pct")
  }

  /** SQL mirror of the stratified gate (CASE over the same rates). */
  def stratifiedGateSql(stratumE: String, keyE: String,
      rates: Map[String, Int], defaultPct: Int): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (s, p) => s"WHEN $stratumE = '$s' THEN $p" }
      .mkString(" ")
    s"(${hModSql(keyE)} % 100 < (CASE $cases ELSE $defaultPct END))"
  }

  /**
   * Deterministic train/val/test assignment: H(key) mod 100 falls into
   * [0, valPct) -> val, [valPct, valPct+testPct) -> test, rest -> train.
   * Same membership on any partitioning/cluster/engine — the split a
   * training pipeline can re-derive forever.
   */
  def split(df: DataFrame, key: Column, valPct: Int, testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      "val/test percentages must be non-negative and sum <= 100")
    val bucket = hMod(key) % 100
    df.withColumn("split",
      when(bucket < valPct, "val")
        .when(bucket < valPct + testPct, "test")
        .otherwise("train"))
  }

  /** SQL mirror of the split assignment (DuckDB dialect). */
  def splitCaseSql(keyE: String, valPct: Int, testPct: Int): String =
    s"""(CASE WHEN ${hModSql(keyE)} % 100 < $valPct THEN 'val'
       |      WHEN ${hModSql(keyE)} % 100 < ${valPct + testPct} THEN 'test'
       |      ELSE 'train' END)""".stripMargin
}
