package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Cooccurrence, Dedup, Tables}

/** Semantic cross-checks for the round-9 wave. */
class Ext41Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("dedup_source_overlap == naive doc-grain recount; purity marginals consistent") {
    // naive recount at DOC grain: for each unordered source pair, the
    // number of components having >=1 doc in each — must equal the
    // (cluster, source)-grain self-join the query uses
    val docs = Tables.table(spark, sfDir, "documents")
    val bySrc = Dedup.simhashComponents(docs, 3)
      .join(docs.select(col("doc_id").as("node"), col("source")), "node")
      .collect().map(r => (r.getAs[Long]("comp"), r.getAs[String]("source")))
      .groupBy(_._1).map { case (c, rows) => c -> rows.map(_._2).toSet }
    val naive = bySrc.values.flatMap(ss =>
      ss.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = ExtQueries41.queries("dedup_source_overlap")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == naive, s"overlap matrix diverged: got=$got naive=$naive")
    assert(naive.nonEmpty, "fixture must have at least one spanning cluster")

    val purity = ExtQueries41.queries("dedup_cluster_purity")(spark, sfDir).collect()
    val pureBySrc = bySrc.toSeq.flatMap { case (_, ss) =>
      if (ss.size == 1) ss.map(_ -> (1L, 1L)) else ss.map(_ -> (1L, 0L)) }
      .groupBy(_._1).map { case (s, v) =>
        s -> (v.map(_._2._1).sum, v.map(_._2._2).sum) }
    purity.foreach { r =>
      val (n, p) = pureBySrc(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == p, s"purity row $r != naive ($n, $p)")
      assert(r.getLong(3) == p * 1000000L / n)
    }
  }

  test("vocab_growth: vocab monotone, ends at the corpus' distinct word count, new_words sums to it") {
    val rows = ExtQueries41.queries("vocab_growth")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val vocab = rows.map(_.getAs[Long]("vocab"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => b >= a }, "vocab must be monotone")
    val distinctWords = Tables.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("word")).distinct().count()
    assert(vocab.last == distinctWords)
    assert(rows.map(_.getAs[Long]("new_words")).sum == distinctWords)
    // Heaps sanity: tokens dominate vocabulary
    assert(rows.map(_.getAs[Long]("n_tokens")).sum > distinctWords)
  }

  test("stream_dsv2_topk == batch LLR top-K over the same staged corpus") {
    val staged = ExtQueries40.stagedCsv(spark, sfDir)
    val inter = spark.read.format("graft-interactions").load(staged)
      .select(col("user"), col("item"), unix_millis(col("ts")).as("ts"))
    val batch = Cooccurrence.llrTopKFromCounts(Cooccurrence.coocCounts(inter), 10)
      .collect().map(_.toSeq).toSet
    val stream = ExtQueries41.queries("stream_dsv2_topk")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"DSv2-streamed pipeline diverged from batch: missing=${(batch -- stream).take(3)}")
  }
}
