package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-checks for the round-6 sixth wave (curation + eval operators). */
class Ext16Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("join_bucketed equals the direct (non-bucketed) join-aggregate") {
    val bucketed = SparkEntry.queries("join_bucketed")(spark, sfDir).collect()
    val li = graft.operators.Tables.table(spark, sfDir, "lineitem")
    val ord = graft.operators.Tables.table(spark, sfDir, "orders")
    import org.apache.spark.sql.types.DecimalType
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(DecimalType(20, 4))).cast("double").as("sum_qty"),
        sum((col("l_extendedprice").cast(DecimalType(20, 4)) *
          (lit(BigDecimal(1)).cast(DecimalType(20, 4)) -
            col("l_discount").cast(DecimalType(20, 4)))))
          .cast(DecimalType(38, 2)).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(bucketed.toSeq == direct.toSeq)
  }

  test("dedup_keep_best: keeper is a member of its component with the max score") {
    val kept = SparkEntry.queries("dedup_keep_best")(spark, sfDir)
    val comp = graft.operators.ConnectedComponents.components(
      graft.operators.Dedup.simhashNearDups(
        graft.operators.Tables.table(spark, sfDir, "documents"), 3))
    // membership + group size
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keptRows = kept.collect()
    assert(keptRows.nonEmpty)
    val members = comp.collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    keptRows.foreach { r =>
      val c = r.getLong(0); val keep = r.getLong(1); val n = r.getLong(2)
      assert(members(c).contains(keep), s"keeper $keep not in component $c")
      assert(n == sizes(c), s"n_members mismatch for $c")
    }
    // every component appears exactly once
    assert(keptRows.map(_.getLong(0)).toSet == sizes.keySet)
  }

  test("ann_recall: n_exact = 10 and the recall ratio is n_hit / 10") {
    val rows = SparkEntry.queries("ann_recall")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val nExact = r.getLong(1); val nHit = r.getLong(2); val rec = r.getDouble(3)
      assert(nExact == 10L)
      assert(nHit >= 0L && nHit <= 10L)
      assert(math.abs(rec - nHit.toDouble / 10.0) < 1e-9)
    }
  }

  test("hard_negatives: every mined negative has a different label than its query") {
    val emb = graft.operators.Tables.table(spark, sfDir, "embeddings")
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("hard_negatives")(spark, sfDir).collect()
    assert(rows.length == 15) // 5 queries x top-3
    rows.foreach { r =>
      val q = r.getLong(0); val v = r.getLong(2); val lab = r.getInt(3)
      assert(labels(v) == lab)
      assert(lab != labels(q), s"negative $v shares label with query $q")
    }
    // and none beats the best same-or-any-label exact neighbor: the top
    // hard negative's cos is bounded by the unrestricted exact top-1
    val exact1 = graft.operators.Similarity
      .bruteForceTopK(emb, ExtQueries.AnnQueries, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    rows.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getDouble(4) <= exact1(r.getLong(0)) + 1e-12)
    }
  }

  test("knn_classify_eval: eval counts cover every strided vector and accuracy is consistent") {
    val emb = graft.operators.Tables.table(spark, sfDir, "embeddings")
    val nEvalExpected = emb
      .where(pmod(col("vec_id"), lit(20)) === 0 && col("vec_id") < 2000L).count()
    val rows = SparkEntry.queries("knn_classify_eval")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nEvalExpected)
    rows.foreach { r =>
      val n = r.getLong(1); val c = r.getLong(2); val acc = r.getDouble(3)
      assert(c >= 0 && c <= n)
      assert(math.abs(acc - c.toDouble / n) < 1e-4 + 1e-9)
    }
  }

  test("cooc_pmi_topk: contiguous ranks, nonincreasing scores, same item set as LLR") {
    val pmi = SparkEntry.queries("cooc_pmi_topk")(spark, sfDir).collect()
    assert(pmi.nonEmpty)
    pmi.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length))
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // same rescorer slot: the item universe matches the LLR top-K's
    val llrItems = SparkEntry.queries("cooc_llr_topk")(spark, sfDir)
      .select(col("item")).distinct().collect().map(_.getInt(0)).toSet
    assert(pmi.map(_.getInt(0)).toSet == llrItems)
  }

  test("preference_pairs: nonneg margin, distinct events, singleton users excluded") {
    val ev = graft.operators.Tables.events(spark, sfDir)
    val rows = SparkEntry.queries("preference_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      assert(r.getLong(1) != r.getLong(2), s"chosen == rejected for user ${r.get(0)}")
    }
    val multi = ev.groupBy(col("user_id")).count().where(col("count") >= 2).count()
    assert(rows.length.toLong == multi)
  }

  test("stream_simhash_dedup equals documents minus the batch near-dup doc_b set") {
    val kept = SparkEntry.queries("stream_simhash_dedup")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val docs = graft.operators.Tables.table(spark, sfDir, "documents")
    val dupB = graft.operators.Dedup.simhashNearDups(docs, 3)
      .select(col("doc_b")).collect().map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == all -- dupB)
  }

  test("streaming fp expression is bit-identical to the batch grouped fingerprint") {
    val docs = graft.operators.Tables.table(spark, sfDir, "documents")
    val stream = docs.select(col("doc_id"),
      graft.streaming.SimhashDedupStream.simhashFpExpr(col("text")).as("fp_s"))
    val batch = graft.operators.Dedup.simhashFingerprints(docs)
      .withColumnRenamed("fp", "fp_b")
    val diff = stream.join(batch, "doc_id")
      .where(col("fp_s") =!= col("fp_b")).count()
    assert(diff == 0L)
  }

  test("text_fertility: regex tokens per word >= 1 and doc counts partition the corpus") {
    val rows = SparkEntry.queries("text_fertility")(spark, sfDir).collect()
    val total = graft.operators.Tables.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 1.0, s"fertility < 1 for ${r.getString(0)}")
      assert(r.getLong(3) >= r.getLong(2)) // re tokens at least ws tokens
    }
  }
}
