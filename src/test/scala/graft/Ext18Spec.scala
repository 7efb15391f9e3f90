package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, Tables, TextAnalysis}

/** Cross-checks for the round-6 eighth wave (DSIR, Gopher rules,
  * incremental dedup, semantic dedup). */
class Ext18Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("dsir weights are partition-independent exact integers") {
    val docs = Tables.table(spark, sfDir, "documents")
    val a = TextAnalysis.dsirWeights(docs, "src0").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = TextAnalysis.dsirWeights(docs.repartition(17), "src0").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("dsir: target-domain docs score higher on average than the rest") {
    val docs = Tables.table(spark, sfDir, "documents")
    val w = TextAnalysis.dsirWeights(docs, "src0")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val Array(tAvg, rAvg) = w
      .groupBy((col("source") === "src0").as("t"))
      .agg(avg(col("w_micro")).as("m"))
      .orderBy(col("t").desc).collect().map(_.getDouble(1))
    // the importance model is fit ON the target split, so it must rank
    // its own domain above the complement in expectation
    assert(tAvg > rAvg)
  }

  test("gopher rules: metrics match a plain-Scala recount on one doc") {
    val doc = Tables.table(spark, sfDir, "documents")
      .orderBy(col("doc_id")).limit(1).collect().head
    val text = doc.getString(doc.fieldIndex("text"))
    val words = text.split(" ", -1)
    val expTop = words.groupBy(identity).values.map(_.length).max
    val expStops = TextAnalysis.EnStopwords.toSet.intersect(words.toSet).size
    val r = TextAnalysis.gopherRules(
      Tables.table(spark, sfDir, "documents").where(col("doc_id") === doc.getLong(0)))
      .collect().head
    assert(r.getInt(r.fieldIndex("n_words")) == words.length)
    assert(r.getInt(r.fieldIndex("stop_hits")) == expStops)
    assert(math.abs(r.getDouble(r.fieldIndex("top_frac")) -
      BigDecimal(expTop.toDouble / words.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("mean_wlen")) -
      BigDecimal(words.map(_.length).sum.toDouble / words.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("gopher pass flag is the conjunction of the rule flags") {
    val rows = TextAnalysis.gopherRules(Tables.table(spark, sfDir, "documents"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = Seq("pass_len", "pass_wlen", "pass_alpha", "pass_stop", "pass_rep")
        .map(f => r.getBoolean(r.fieldIndex(f)))
      assert(r.getBoolean(r.fieldIndex("pass")) == flags.forall(identity))
    }
  }

  test("incremental dedup flags a planted duplicate and never index-side pairs") {
    val s = spark
    import s.implicits._
    // ids: % 5 == 4 -> incoming shard. 9 duplicates standing doc 1;
    // 14 is unique; 4 near-duplicates standing doc 2 (same word set).
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "unrelated totally different words here now"),
      (9L, "alpha beta gamma delta epsilon zeta"),
      (4L, "seven six five four three two one"),
      (14L, "nothing shares these tokens anywhere ever")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalMinhashDedup(docs, col("doc_id") % 5 === 4, 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(4L, 9L, 14L))
    assert(out(9L) == ((true, 1L)))
    assert(out(4L) == ((true, 2L))) // word-set equality: order doesn't matter
    assert(out(14L) == ((false, -1L)))
  }

  test("streaming ingest dedup equals the batch verdict row-for-row") {
    val batch = SparkEntry.queries("dedup_incremental")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sorted
    val streamed = SparkEntry.queries("stream_incremental_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sorted
    assert(streamed.sameElements(batch))
    assert(batch.nonEmpty)
  }

  test("semantic dedup agrees with the pairwise LSH near-dup relation") {
    val embs = Tables.table(spark, sfDir, "embeddings")
    val ledger = SparkEntry.queries("dedup_semantic")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    val pairs = Dedup.embeddingNearDupsLsh(embs, 0.30).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val removersOf = pairs.groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
    ledger.foreach { case (id, (kept, by)) =>
      removersOf.get(id) match {
        case Some(minA) => assert(!kept && by == minA && by < id)
        case None       => assert(kept && by == -1L)
      }
    }
    assert(ledger.values.exists(!_._1), "corpus should contain semantic dups")
  }
}
