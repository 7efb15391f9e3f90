package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Driver-side cross-checks for the round-6 third wave. */
class Ext13Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("sequence_examples: every context is the 3 time-ordered predecessors; count = sum(max(0, n_u - 3))") {
    val got = ExtQueries13.queries("sequence_examples")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3).split("\\|").toList, r.getString(4)))
    val hist = graft.operators.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)).map(e => (e._3, e._4)).toVector).toMap
    val expectCount = hist.values.map(v => math.max(0, v.length - 3)).sum
    assert(got.length == expectCount)
    got.foreach { case (u, eid, pos, ctx, label) =>
      val h = hist(u)
      val i = pos.toInt - 1
      assert(h(i)._1 == eid && h(i)._2 == label, s"user $u pos $pos")
      assert(ctx == h.slice(i - 3, i).map(_._2).toList, s"user $u pos $pos context")
    }
  }

  test("curriculum_order: bijective positions, contiguous per-bucket ranks, round-robin interleave") {
    val got = ExtQueries13.queries("curriculum_order")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    val nDocs = graft.operators.Tables.table(spark, sfDir, "documents").count()
    assert(got.length == nDocs)
    assert(got.map(_._4).distinct.length == got.length, "curriculum positions unique")
    got.groupBy(_._2).foreach { case (b, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length), s"bucket $b ranks contiguous")
    }
    // interleave: sorted by position, the first k buckets (k = #nonempty)
    // are pairwise distinct — each difficulty level appears once per slice
    val k = got.map(_._2).distinct.length
    val firstSlice = got.sortBy(_._4).take(k).map(_._2)
    assert(firstSlice.distinct.length == k, s"first slice covers all $k buckets once")
  }

  test("stream_mv_merge: merged per-batch partials equal the batch recompute") {
    val got = ExtQueries13.queries("stream_mv_merge")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val full = graft.operators.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
          .cast("double").as("total"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == full.toSeq)
  }
}
