package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-checks for the round-7 privacy-audit wave (ExtQueries27). */
class Ext27Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("k-anonymity ladder: generalization is monotone, counts consistent") {
    val rows = ExtQueries27.queries("k_anonymity_ladder")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Int]("bucket_width"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("at_risk_classes"), r.getAs[Long]("at_risk_docs"),
        r.getAs[Long]("min_class_size")))
    assert(rows.map(_._1).toSeq == Seq(50, 100, 200, 400))
    // wider buckets merge classes: class count is non-increasing along
    // the ladder, and every width's at-risk set is a subset of classes
    val byWidth = rows.sortBy(_._1)
    assert(byWidth.map(_._2).reverse.sameElements(byWidth.map(_._2).sorted))
    rows.foreach { case (_, nc, risk, riskDocs, minSz) =>
      assert(risk <= nc)
      assert(riskDocs <= risk * 4) // each at-risk class has < 5 docs
      assert(minSz >= 1)
    }
  }

  test("k-anonymity flags a planted singleton class") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("en", "web", 120L), ("en", "web", 130L), ("en", "web", 140L),
      ("en", "web", 125L), ("en", "web", 135L), // 5 docs: safe class
      ("fr", "scan", 900L) // singleton: at risk at every width
    ).toDF("lang", "source", "n_chars")
    val classes = docs
      .select(col("lang"), col("source"), expr("n_chars DIV 100").as("b"))
      .groupBy(col("lang"), col("source"), col("b"))
      .agg(count(lit(1)).as("n"))
    val atRisk = classes.where(col("n") < 5).collect()
    assert(atRisk.length == 1 && atRisk.head.getAs[String]("lang") == "fr")
    assert(classes.where(col("n") >= 5).count() == 1)
  }
}
