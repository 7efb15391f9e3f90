package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, Tables}

/** Semantic cross-checks for the round-10 wave: incremental cluster-index
  * refresh must equal the full rebuild, for any base/incoming split. */
class Ext43Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def comps(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("refresh == full rebuild on real corpus data, several split ratios") {
    val docs = Tables.table(spark, sfDir, "documents")
    val full = comps(Dedup.simhashComponents(docs, 3))
    // different split geometries exercise attach (incoming joins a
    // standing cluster), fresh clusters (incoming-only pairs), and the
    // degenerate corners (all-base / heavy-incoming)
    for (mod <- Seq(2, 3, 5, 10)) {
      val inc = col("doc_id") % mod === 0
      val base = Dedup.simhashComponents(docs.where(!inc), 3)
      val refreshed = comps(Dedup.simhashComponentsRefresh(docs, inc, 3, base))
      assert(refreshed == full, s"refresh(mod=$mod) diverged from rebuild: " +
        s"missing=${(full -- refreshed).take(5)} extra=${(refreshed -- full).take(5)}")
    }
  }

  test("refresh attaches, creates fresh clusters, and pairs unclustered base docs") {
    // base: two exact-dup clusters {1,2} and {10,11} (identical text =>
    // identical fingerprint => hamming 0) plus unpaired 20; incoming: 5
    // duplicates cluster-1's text (ATTACH), 6+7 are a brand-new dup pair
    // (FRESH cluster), 8 duplicates 20's text (pairs a previously
    // UNCLUSTERED base doc)
    val docs = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (10L, "epsilon zeta eta theta"), (11L, "epsilon zeta eta theta"),
      (20L, "iota kappa lambda mu"),
      (5L, "alpha beta gamma delta"),
      (6L, "nu xi omicron pi"), (7L, "nu xi omicron pi"),
      (8L, "iota kappa lambda mu")
    )).toDF("doc_id", "text")
    val inc = col("doc_id").isin(5L, 6L, 7L, 8L)
    val base = Dedup.simhashComponents(docs.where(!inc), 3)
    assert(comps(base) == Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)),
      "base index construction changed")
    val refreshed = comps(Dedup.simhashComponentsRefresh(docs, inc, 3, base))
    val full = comps(Dedup.simhashComponents(docs, 3))
    assert(refreshed == full, s"refresh=$refreshed full=$full")
    // and the semantic shape: 5 attached to comp 1; {6,7} fresh comp 6;
    // {8,20} clusters the formerly-unpaired base doc under label 8
    assert(refreshed == Set((1L, 1L), (2L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L), (6L, 6L), (7L, 6L), (8L, 8L), (20L, 8L)))
  }

  test("minhash refresh == full rebuild on real corpus data, several split ratios") {
    val docs = Tables.table(spark, sfDir, "documents")
    val full = comps(Dedup.minhashComponents(docs, 0.9))
    for (mod <- Seq(3, 5)) {
      val inc = col("doc_id") % mod === 0
      val base = Dedup.minhashComponents(docs.where(!inc), 0.9)
      val refreshed = comps(Dedup.minhashComponentsRefresh(docs, inc, 0.9, base))
      assert(refreshed == full, s"minhash refresh(mod=$mod) diverged: " +
        s"missing=${(full -- refreshed).take(5)} extra=${(refreshed -- full).take(5)}")
    }
  }

  test("streaming index maintenance drains to the full-rebuild index") {
    val docs = Tables.table(spark, sfDir, "documents")
    val full = comps(Dedup.simhashComponents(docs, 3))
    val streamed = ExtQueries43.queries("stream_index_refresh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == full, s"streamed index diverged: " +
      s"missing=${(full -- streamed).take(5)} extra=${(streamed -- full).take(5)}")
  }

  test("delta refresh == full rebuild EXCEPT base index (simhash and minhash)") {
    val docs = Tables.table(spark, sfDir, "documents")
    val inc = col("doc_id") % 5 === 4
    // simhash
    val sBase = Dedup.simhashComponents(docs.where(!inc), 3)
    val sBaseSet = comps(sBase)
    val sFull = comps(Dedup.simhashComponents(docs, 3))
    val sDelta = comps(Dedup.simhashComponentsRefreshDelta(docs, inc, 3, sBase))
    assert(sDelta == (sFull -- sBaseSet),
      s"simhash delta != full-minus-base: extra=${(sDelta -- (sFull -- sBaseSet)).take(5)} " +
        s"missing=${((sFull -- sBaseSet) -- sDelta).take(5)}")
    assert(sDelta.nonEmpty, "degenerate split — the delta case is untested")
    // MERGE composition: base rows whose node is absent from the delta,
    // plus the delta, reconstruct the full index exactly
    val deltaNodes = sDelta.map(_._1)
    assert(sBaseSet.filterNot(r => deltaNodes(r._1)) ++ sDelta == sFull)
    // minhash
    val mBase = Dedup.minhashComponents(docs.where(!inc), 0.9)
    val mBaseSet = comps(mBase)
    val mFull = comps(Dedup.minhashComponents(docs, 0.9))
    val mDelta = comps(Dedup.minhashComponentsRefreshDelta(docs, inc, 0.9, mBase))
    assert(mDelta == (mFull -- mBaseSet),
      s"minhash delta != full-minus-base: extra=${(mDelta -- (mFull -- mBaseSet)).take(5)} " +
        s"missing=${((mFull -- mBaseSet) -- mDelta).take(5)}")
  }

  test("signature-level minhash refresh == doc-level (stored-column regime)") {
    val docs = Tables.table(spark, sfDir, "documents")
    val inc = col("doc_id") % 5 === 4
    val (sigs, wordSets) = Dedup.minhashRefreshInputs(docs, inc)
    val base = Dedup.minhashComponents(docs.where(!inc), 0.9)
    val fromSigs =
      comps(Dedup.minhashComponentsRefreshFromSigs(sigs, wordSets, 0.9, base))
    assert(fromSigs == comps(Dedup.minhashComponents(docs, 0.9)))
  }

  test("empty incoming shard: refresh is the identity on the standing index") {
    val docs = Tables.table(spark, sfDir, "documents")
    val base = Dedup.simhashComponents(docs, 3)
    val refreshed = comps(Dedup.simhashComponentsRefresh(docs, lit(false), 3, base))
    assert(refreshed == comps(base))
  }
}
