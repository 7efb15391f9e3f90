package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, PortableHash}
import graft.operators.PortableHash._

/**
 * Byte-equality of the r17 per-row staging forms (SimHash fingerprint,
 * MinHash signatures, MinHash staged columns) against the grouped
 * explode/distinct/aggregate forms they replaced — reconstructed
 * verbatim here. The per-row forms must produce the identical rows for
 * corpora with repeated words, single-word docs, empty-string text and
 * shared vocabulary (the values are per-document functions; only the
 * plan shape changed: no explode, no distinct exchange, no aggregation
 * exchange per staging pass).
 */
class StagingRowFormSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def docsDf: DataFrame = {
    val rng = new scala.util.Random(0x517A6E)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "x", "", "the", "a")
    val rows = (0L until 300L).map { id =>
      val n = 1 + rng.nextInt(12)
      // repeated words on purpose: distinct-set semantics must hold
      val words = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      (id, words.mkString(" "))
    } :+ (300L, "") :+ (301L, "solo")
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  // ---- the pre-r17 grouped forms, verbatim ----

  private def oldSimhashFingerprints(docs: DataFrame): DataFrame = {
    val hashed = Dedup.docWords(docs).withColumn("h", h(col("word")))
    val bitSums = (0 until SimHashBits).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$i")
    }
    val fp = (0 until SimHashBits)
      .map(i => when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ + _)
    hashed
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("fp"))
  }

  private def oldMinhashSignatures(docs: DataFrame): DataFrame = {
    val hashed = Dedup.docWords(docs).withColumn("hm", hMod(col("word")))
    val aggs = (0 until NumHashes).map(j =>
      min(PortableHash.minhash(j, col("hm"))).as(s"mh$j"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private def oldMinhashStagedColumns(docs: DataFrame): DataFrame = {
    val words = Dedup.docWords(docs)
    val sigs = {
      val s = oldMinhashSignatures(docs)
      val sigCols = (0 until NumBands).map { bnd =>
        concat_ws(",",
          (bnd * BandRows until (bnd + 1) * BandRows).map(j => col(s"mh$j").cast("string")): _*)
          .as(s"band$bnd")
      }
      s.select(col("doc_id") +: sigCols: _*)
    }
    val wordSets = words.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(xxhash64(col("word")))).as("wset"),
        count(lit(1)).as("n_w"))
    sigs.join(wordSets, "doc_id")
  }

  private def sortedRows(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.orderBy("doc_id").collect().toSeq

  test("simhashFingerprints per-row == grouped form") {
    val d = docsDf
    assert(sortedRows(Dedup.simhashFingerprints(d)) ==
      sortedRows(oldSimhashFingerprints(d)))
  }

  test("minhashSignatures per-row == grouped form (names, types, values)") {
    val d = docsDf
    val neu = Dedup.minhashSignatures(d)
    val old = oldMinhashSignatures(d)
    assert(neu.columns.toSeq == old.columns.toSeq)
    assert(sortedRows(neu) == sortedRows(old))
  }

  test("minhashStagedColumns per-row == grouped form (bands, wset, n_w)") {
    val d = docsDf
    val neu = Dedup.minhashStagedColumns(d)
    val old = oldMinhashStagedColumns(d)
    assert(neu.columns.toSeq == old.columns.toSeq)
    assert(sortedRows(neu) == sortedRows(old))
  }

  test("minhashRefreshInputs per-row == grouped form, inc flag intact") {
    val d = docsDf
    val (sigs, wsets) = Dedup.minhashRefreshInputs(d, col("doc_id") >= 150)
    val oldStaged = oldMinhashStagedColumns(d)
    val oldSigs = oldStaged
      .select(col("doc_id") +: (0 until NumBands).map(b => col(s"band$b")): _*)
      .withColumn("inc", col("doc_id") >= 150)
    val oldWsets = oldStaged.select(col("doc_id"), col("wset"), col("n_w"))
    assert(sigs.columns.toSeq == oldSigs.columns.toSeq)
    assert(sortedRows(sigs) == sortedRows(oldSigs))
    assert(sortedRows(wsets) == sortedRows(oldWsets))
  }

  test("null-text docs are dropped exactly like the exploded forms") {
    val d = spark.createDataFrame(Seq((1L, "a b"), (2L, "c")))
      .toDF("doc_id", "text")
      .withColumn("text", when(col("doc_id") === 2, lit(null: String)).otherwise(col("text")))
    assert(sortedRows(Dedup.simhashFingerprints(d)).map(_.getLong(0)) == Seq(1L))
    assert(sortedRows(Dedup.minhashSignatures(d)).map(_.getLong(0)) == Seq(1L))
    assert(sortedRows(Dedup.minhashStagedColumns(d)).map(_.getLong(0)) == Seq(1L))
  }
}
