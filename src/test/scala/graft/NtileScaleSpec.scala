package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.PrefixScan

/**
 * Determinism locks for the distributed NTILE: the result must be a
 * pure function of the data and the order spec — invariant to the
 * bucket count (shuffle.partitions drives the two-level scan's range
 * bucketing) and to the physical input layout, and bit-equal to the
 * built-in ntile window on the same total order.
 */
class NtileScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sample(n: Int, parts: Int) = {
    val s = spark; import s.implicits._
    // duplicate-heavy order values to exercise the tie path
    (1 to n).map(i => (i.toLong, (i % 17).toLong)).toDF("id", "v")
      .repartition(parts)
  }

  test("ntileDistributed equals the built-in ntile window for ragged N/k") {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(7, 50, 101); k <- Seq(3, 5, 10)) {
      val df = sample(n, 3)
      val got = PrefixScan.ntileDistributed(df, "v", Seq("id"), k, "t")
        .select(col("id"), col("t")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select(col("id"), col("t")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("ntileDistributed is invariant to bucket count and input layout") {
    val base = PrefixScan
      .ntileDistributed(sample(200, 1), "v", Seq("id"), 5, "t")
      .select(col("id"), col("t")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (parts <- Seq(2, 7); buckets <- Seq("1", "8")) {
      val prior = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", buckets)
      try {
        val got = PrefixScan
          .ntileDistributed(sample(200, parts), "v", Seq("id"), 5, "t")
          .select(col("id"), col("t")).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == base, s"parts=$parts buckets=$buckets")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
    }
  }
}
