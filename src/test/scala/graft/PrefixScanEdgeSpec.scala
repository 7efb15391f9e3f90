package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.PrefixScan

/** Degenerate-input behavior of the two-level scan family. */
class PrefixScanEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def df(rows: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "w")
  }

  private def emptyKw = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("k", LongType), StructField("w", LongType))))

  test("runningSumExclusive: empty input -> empty output, no exception") {
    assert(PrefixScan.runningSumExclusive(emptyKw, "k", "w", "cum").count() == 0)
  }

  test("runningSumExclusive: single row -> exclusive prefix 0") {
    val out = PrefixScan.runningSumExclusive(df(Seq((5L, 42L))), "k", "w", "cum")
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("cum") == 0L)
  }

  test("ntileDistributed: empty input -> empty; N < k -> tiles 1..N") {
    assert(PrefixScan.ntileDistributed(emptyKw, "k", Nil, 5, "t").count() == 0)
    val tiles = PrefixScan
      .ntileDistributed(df(Seq((3L, 0L), (1L, 0L), (2L, 0L))), "k", Nil, 10, "t")
      .orderBy(col("k")).collect().map(_.getAs[Int]("t")).toSeq
    assert(tiles == Seq(1, 2, 3), "with N < k every row gets its own tile by rank")
  }

  test("runningMaxExclusive: first row gets a null prefix") {
    val out = PrefixScan
      .runningMaxExclusive(df(Seq((1L, 10L), (2L, 7L), (3L, 12L))), "k", "w", "wm")
      .orderBy(col("k")).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("wm")))
    assert(out(1).getAs[Long]("wm") == 10L)
    assert(out(2).getAs[Long]("wm") == 10L)
  }
}
