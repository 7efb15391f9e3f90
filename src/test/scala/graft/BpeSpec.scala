package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{BpeTrainer, Tables}

/**
 * The distributed BPE loop must produce the EXACT merge sequence of the
 * single-machine reference implementation (same word-freq table, same
 * total-order tie-break), independent of partitioning.
 */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("all three loops agree: reference == local (train default) == distributed") {
    val docs = Tables.table(spark, sfDir, "documents")
    val freqs = BpeTrainer.wordFreqs(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = BpeTrainer.referenceTrain(freqs, 12)
    // train() takes the DRIVER-LOCAL incremental path here (vocab far
    // under the cap) — the production fast path since r14
    val got = BpeTrainer.train(docs, 12)
    assert(got == expected, s"merge sequences differ:\n got=$got\n exp=$expected")
    val got2 = BpeTrainer.train(docs.repartition(7), 12)
    assert(got2 == expected, "merge sequence must be partition-independent")
    // the distributed per-round loop (the vocab-exceeds-driver fallback)
    // must land on the identical sequence
    val dist = BpeTrainer.distributedTrain(BpeTrainer.wordFreqs(docs), 12)
    assert(dist == expected, s"distributed loop diverged:\n got=$dist")
    // and the incremental local loop called directly, for completeness
    assert(BpeTrainer.localTrain(freqs, 12) == expected)
    assert(got.size == 12)
  }

  test("merged symbols reconstruct words (merges are consistent)") {
    val docs = Tables.table(spark, sfDir, "documents")
    val merges = BpeTrainer.train(docs, 8)
    val words = BpeTrainer.wordFreqs(docs).limit(20).collect().map(_.getString(0))
    words.foreach { w =>
      val syms = BpeTrainer.applyMerges(w, merges)
      assert(syms.mkString == w + BpeTrainer.EndMark,
        s"merge application broke word '$w': $syms")
    }
  }

  test("encode (vocab-join shape) == naive per-document merge application") {
    val docs = Tables.table(spark, sfDir, "documents")
    val merges = BpeTrainer.train(docs, 12)
    val got = BpeTrainer.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sample = docs.select("doc_id", "text").limit(30).collect()
    sample.foreach { r =>
      val naive = r.getString(1).split(" ").iterator.filter(_.nonEmpty)
        .map(w => BpeTrainer.applyMerges(w, merges).length.toLong).sum
      assert(got(r.getLong(0)) == naive,
        s"doc ${r.getLong(0)}: encode ${got(r.getLong(0))} != naive $naive")
    }
  }

  test("tokenize sequences == naive per-document merge application, positions contiguous") {
    val docs = Tables.table(spark, sfDir, "documents")
    val merges = BpeTrainer.train(docs, 12)
    val got = BpeTrainer.tokenize(docs, merges).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (d, rows) => d -> rows.sortBy(_._2).map(t => (t._2, t._3)).toSeq }
    docs.select("doc_id", "text").limit(30).collect().foreach { r =>
      val naive = r.getString(1).split(" ").iterator.filter(_.nonEmpty)
        .flatMap(w => BpeTrainer.applyMerges(w, merges)).toSeq
      val seq = got(r.getLong(0))
      assert(seq.map(_._1) == (0 until naive.length), s"doc ${r.getLong(0)}: gaps in pos")
      assert(seq.map(_._2) == naive,
        s"doc ${r.getLong(0)}: sequence mismatch (${seq.take(5)} vs ${naive.take(5)})")
    }
  }
}
