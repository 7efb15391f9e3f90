package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the round-7 evaluation-utilities wave (ExtQueries26). */
class Ext26Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("global_sample_k draws exactly K docs, invariant to physical layout") {
    val report = ExtQueries26.queries("global_sample_k")(spark, sfDir).collect()
    val total = report.map(_.getAs[Long]("n_in_sample")).sum
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(total == math.min(100L, nDocs))
    // the selected ID set is a pure function of the hash: recompute from
    // a 7-way shuffled layout and compare the per-source ledgers
    import graft.operators.PortableHash
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.withColumn("hv",
          PortableHash.hMod(concat(lit("gsk|"), col("doc_id").cast("string"))))
        .orderBy(col("hv"), col("doc_id")).limit(100)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val docs = Tables.table(spark, sfDir, "documents")
    assert(ids(docs) == ids(docs.repartition(7, col("source"))))
  }

  test("calibration_bins: deciles partition the corpus; rates bounded; totals add up") {
    val rows = ExtQueries26.queries("calibration_bins")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val d = Tables.table(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n")).sum == d.count())
    assert(rows.map(_.getAs[Long]("n_pos")).sum ==
      d.where(col("lang") === "en").count())
    // ntile: bucket sizes differ by at most 1
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1)
    rows.foreach { r =>
      val rate = r.getAs[Double]("pos_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("min_score") <= r.getAs[Long]("max_score"))
    }
    // score deciles are ordered: each bucket's min >= previous bucket's min
    val mins = rows.map(_.getAs[Long]("min_score"))
    assert(mins.sameElements(mins.sorted))
  }
}
