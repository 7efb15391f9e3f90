package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the RFM segmentation wave (ExtQueries28). */
class Ext28Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("rfm_segments: cube partitions the user base; quintiles balanced") {
    val rows = ExtQueries28.queries("rfm_segments")(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    // each single dimension's marginal is a quintile partition: sizes
    // differ by at most 1 across its five segments
    Seq("r_seg", "f_seg", "m_seg").foreach { dim =>
      val marginal = rows.groupBy(_.getAs[Int](dim))
        .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_users")).sum }
      assert(marginal.keySet == (1 to 5).toSet, s"$dim segments")
      val sizes = marginal.values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$dim quintiles unbalanced: $marginal")
    }
  }
}
