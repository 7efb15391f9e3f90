package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the round-7 operational-analytics wave (ExtQueries24). */
class Ext24Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
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

  test("ewma_anomaly equals a driver-side integer recurrence") {
    val rows = ExtQueries24.queries("ewma_anomaly")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // recompute the fixed-point recurrence from the (type, day, n) columns
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val ordered = xs.sortBy(_._2)
      var e = 0L
      ordered.zipWithIndex.foreach { case ((_, _, n, ewma, dev, flag), i) =>
        val scaled = n * 1048576L
        if (i == 0) {
          e = scaled
          assert(dev == 0L && !flag)
        } else {
          assert(dev == scaled - e)
          assert(flag == (math.abs(scaled - e) * 2 > e))
          e = (3 * e + scaled) / 4
        }
        assert(ewma == e)
      }
    }
  }

  test("ewma_anomaly flags a planted volume spike") {
    val s = spark
    import s.implicits._
    // 10 steady days then a 10x spike: the spike day must flag, and no
    // steady day may (recurrence converges to the steady value exactly)
    val daily = (1 to 10).map(d => ("t", f"2026-01-$d%02d", 100L)) :+
      (("t", "2026-01-11", 1000L))
    var e = 0L
    val flags = daily.zipWithIndex.map { case ((_, _, n), i) =>
      val scaled = n * 1048576L
      val flag = i > 0 && math.abs(scaled - e) * 2 > e
      e = if (i == 0) scaled else (3 * e + scaled) / 4
      flag
    }
    assert(flags.take(10).forall(!_))
    assert(flags.last)
  }

  test("file_provenance partitions lineitem by file, exactly") {
    val rows = ExtQueries24.queries("file_provenance")(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("f0", "f1", "f2", "f3"))
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.table(spark, sfDir, "lineitem").count())
  }

  test("stream_ewma_anomaly equals the batch chart truncated at the watermark") {
    val batch = ExtQueries24.queries("ewma_anomaly")(spark, sfDir)
    val maxTs = Tables.events(spark, sfDir)
      .agg(max(expr("unix_micros(ts)"))).head().getLong(0)
    val expected = batch
      .where(expr("unix_micros(to_timestamp(day)) + 86400000000") <= maxTs)
      .collect().map(_.toSeq).toSeq
    val streamed = ExtQueries24.queries("stream_ewma_anomaly")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == expected)
    assert(streamed.nonEmpty && streamed.size < batch.count())
  }

  test("partition_backfill replaces exactly the backfilled day") {
    val rows = ExtQueries24.queries("partition_backfill")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val full = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_type")).as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val d0 = full.head._1
    // the backfilled day keeps only clicks (one type); every other day
    // is byte-for-byte the original partition
    val clicksD0 = Tables.events(spark, sfDir)
      .where(date_format(col("ts"), "yyyy-MM-dd") === d0 &&
        col("event_type") === "click").count()
    assert(rows.head == ((d0, clicksD0, 1L)))
    assert(rows.tail.toSeq == full.tail.toSeq)
  }

  test("gap_stats: median is a realized gap and the count identity holds") {
    val rows = ExtQueries24.queries("gap_stats")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.table(spark, sfDir, "events")
    val nTypes = ev.select(col("event_type")).distinct().count()
    val totalGaps = rows.map(_.getAs[Long]("n_gaps")).sum
    assert(totalGaps == ev.count() - nTypes) // one fewer gap than rows per type
    rows.foreach { r =>
      val med = r.getAs[Long]("median_gap_us")
      val max = r.getAs[Long]("max_gap_us")
      val sum = r.getAs[Long]("sum_gap_us")
      val n = r.getAs[Long]("n_gaps")
      assert(med >= 0 && med <= max)
      assert(sum >= med * (n / 2)) // half the gaps are >= the median... at least on the upper side
    }
  }
}
