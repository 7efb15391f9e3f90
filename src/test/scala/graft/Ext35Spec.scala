package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-checks for the composed curation pipeline (ExtQueries35). */
class Ext35Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("pipeline_pretrain_funnel: strict stage order, monotone attrition, budget respected") {
    val rows = ExtQueries35.queries("pipeline_pretrain_funnel")(spark, sfDir).collect()
    val stages = rows.map(_.getAs[String]("stage"))
    assert(stages.toSeq == Seq("s0_corpus", "s1_gopher", "s2_bag_dedup",
      "s3_decontam", "s4_source_cap", "s5_token_budget"))
    // every stage only removes documents
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"), s"docs grew: $a -> $b")
        assert(b.getAs[Long]("n_words") <= a.getAs[Long]("n_words"), s"words grew: $a -> $b")
      case _ => ()
    }
    val byStage = rows.map(r => r.getAs[String]("stage") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"))).toMap
    assert(byStage("s0_corpus")._1 > 0)
    assert(byStage("s5_token_budget")._1 > 0, "the budget stage must keep something")
    // the greedy prefix never exceeds half the post-cap token mass
    assert(byStage("s5_token_budget")._2 <= byStage("s4_source_cap")._2 / 2)
  }
}
