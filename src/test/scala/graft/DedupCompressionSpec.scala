package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, PortableHash}

/**
 * Identical-word-set compression in minhashNearDups (round-7) must be
 * invisible: the output has to equal an independent brute-force
 * reference — all doc pairs that (a) collide on at least one minhash
 * band and (b) pass exact word-set Jaccard — on a corpus engineered to
 * stress the compression: heavy exact-set duplication (same set,
 * different order/multiplicity), near-dups across sets, and singletons.
 */
class DedupCompressionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Deterministic synthetic corpus over a 30-word vocabulary. */
  private def corpus(): Seq[(Long, String)] = {
    val vocab = (0 until 30).map(i => s"w$i")
    val rnd = new scala.util.Random(12345)
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var id = 0L
    // 40 base docs of 8-14 distinct words
    val bases = (0 until 40).map { _ =>
      rnd.shuffle(vocab).take(8 + rnd.nextInt(7)).toVector
    }
    bases.foreach { words =>
      docs += ((id, words.mkString(" "))); id += 1
      // 0-5 exact-SET duplicates: same words, shuffled, some repeated
      (0 until rnd.nextInt(6)).foreach { _ =>
        val shuffled = rnd.shuffle(words ++ words.take(rnd.nextInt(words.size)))
        docs += ((id, shuffled.mkString(" "))); id += 1
      }
      // one near-dup: drop one word (jaccard (n-1)/n, high for n>=9)
      if (rnd.nextBoolean()) {
        docs += ((id, rnd.shuffle(words.drop(1)).mkString(" "))); id += 1
      }
    }
    docs.toSeq
  }

  test("compressed minhashNearDups == brute-force band-collision + exact jaccard") {
    val sp = spark; import sp.implicits._
    val data = corpus()
    val docs = data.toDF("doc_id", "text")
    val threshold = 0.8

    val got = Dedup.minhashNearDups(docs, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // independent reference: signatures via the production hash family,
    // but candidates + jaccard by driver-side brute force over all pairs
    val sigRows = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) ->
        (0 until PortableHash.NumHashes).map(j => r.getLong(1 + j)).toVector).toMap
    val sets = data.map { case (id, text) =>
      id -> text.split(" ").filter(_.nonEmpty).toSet
    }.toMap
    def bandsOf(sig: Vector[Long]): Seq[Vector[Long]] =
      (0 until PortableHash.NumBands).map(b =>
        sig.slice(b * PortableHash.BandRows, (b + 1) * PortableHash.BandRows))
    val ids = data.map(_._1).filter(sets(_).nonEmpty).sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      if bandsOf(sigRows(a)).zip(bandsOf(sigRows(b))).exists { case (x, y) => x == y }
      inter = (sets(a) & sets(b)).size
      jac = inter.toDouble / (sets(a) ++ sets(b)).size
      if jac >= threshold
    } yield (a, b, math.rint(jac * 10000) / 10000)).toSet

    assert(got == expected,
      s"got ${got.size} pairs, expected ${expected.size}; " +
        s"missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
    // the corpus must actually stress compression: duplicate sets exist
    val nSets = sets.values.toSet.size
    assert(nSets < data.size - 20, s"corpus not degenerate enough: ${data.size} docs, $nSets sets")
  }
}
