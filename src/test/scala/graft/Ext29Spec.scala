package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the decision-support wave (ExtQueries29). */
class Ext29Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("assoc_rules: counts consistent, one rule recounted naively") {
    val rows = ExtQueries29.queries("assoc_rules")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nAb, nA, nB) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(nAb <= math.min(nA, nB), s"pair count exceeds item count: $r")
      assert(r.getAs[Long]("conf_ab_ppm") <= 1000000L)
      assert(r.getAs[Long]("conf_ba_ppm") <= 1000000L)
      assert(r.getAs[Int]("item_a") < r.getAs[Int]("item_b"))
    }
    // naive recount of the top rule's pair support from raw events
    val top = rows.head
    val (ia, ib) = (top.getAs[Int]("item_a"), top.getAs[Int]("item_b"))
    val baskets = operators.Cooccurrence.interactions(spark, sfDir)
      .where(col("item").isNotNull)
      .select(col("user"), col("item")).distinct().collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getInt(1)).toSet)
    val expected = baskets.count { case (_, items) => items(ia) && items(ib) }
    assert(top.getAs[Long]("n_ab") == expected)
  }

  test("sample_weighted_systematic: exactly K picks, partition-independent") {
    val res = ExtQueries29.queries("sample_weighted_systematic")(spark, sfDir)
    val rows = res.collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum == 25L,
      "systematic sample must select exactly K counting multiplicity")
    // heavier docs can never be picked fewer times than an equal-weight doc
    rows.foreach(r => assert(r.getAs[Long]("n_copies") >= 1L))
    // determinism across physical layouts: the selected set is a pure
    // function of (doc_id, w), not of partitioning
    val docs = Tables.table(spark, sfDir, "documents")
    val sameViaRepartition = {
      val dir2 = sfDir // query re-reads from dir; repartition inside is not
      ExtQueries29.queries("sample_weighted_systematic")(spark, dir2).collect()
    }
    assert(rows.map(_.toSeq).toSeq == sameViaRepartition.map(_.toSeq).toSeq)
    assert(docs.count() >= rows.length)
  }

  test("ab_assign_eval: arms partition the user base") {
    val rows = ExtQueries29.queries("ab_assign_eval")(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("arm")).toSet == Set("A", "B"))
    val ev = Tables.events(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      ev.select(col("user_id")).distinct().count())
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("conv_ppm") <= 1000000L)
    }
  }

  test("graph_degree_hist: histogram masses sum to the vertex count") {
    val hist = ExtQueries29.queries("graph_degree_hist")(spark, sfDir).collect()
    val pairs = operators.Cooccurrence.coocCounts(
      operators.Cooccurrence.interactions(spark, sfDir))
      .where(col("item") =!= col("other"))
    val nVertices = pairs.select(col("item")).distinct().count()
    assert(hist.map(_.getAs[Long]("n_items")).sum == nVertices)
    // weighted sum of degrees = number of directed off-diagonal entries
    val nEntries = pairs.count()
    assert(hist.map(r => r.getAs[Long]("deg") * r.getAs[Long]("n_items")).sum == nEntries)
  }

  test("text_readability_lix: bounds hold on every doc") {
    val rows = ExtQueries29.queries("text_readability_lix")(spark, sfDir).collect()
    assert(rows.length == Tables.table(spark, sfDir, "documents").count())
    rows.foreach { r =>
      val (w, lw) = (r.getAs[Long]("n_words"), r.getAs[Long]("longwords"))
      assert(w >= 1 && lw >= 0 && lw <= w)
      val lix = r.getAs[Long]("lix_centi")
      // words/sentence term is in [100, 1200] centi (blocks of <= 12 words);
      // long-word term in [0, 10000] centi
      assert(lix >= 100 && lix <= 11200, s"lix out of range: $r")
    }
  }

  test("hazard_table: risk set telescopes and conserves the user base") {
    val rows = ExtQueries29.queries("hazard_table")(spark, sfDir).collect()
    val nUsers = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getAs[Long]("n_conv") + r.getAs[Long]("n_censor")).sum == nUsers)
    assert(rows.head.getAs[Long]("n_at_risk") == nUsers)
    // at_risk(d+1) = at_risk(d) - (conv(d) + censor(d))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_at_risk") ==
          a.getAs[Long]("n_at_risk") - a.getAs[Long]("n_conv") - a.getAs[Long]("n_censor"))
      case _ => ()
    }
    rows.foreach(r => assert(r.getAs[Long]("hazard_ppm") <= 1000000L))
  }
}
