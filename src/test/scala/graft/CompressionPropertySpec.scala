package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Dedup

/**
 * Randomized equivalence properties for the round-8 identical-set
 * compressions: on small corpora DESIGNED to produce identical-content
 * cohorts (tiny vocabulary, forced exact clones), the compressed
 * operators must equal a brute-force doc-level reference computed with
 * plain Scala — not just on the checked fixtures but across seeds.
 * Brute force is O(n^2) over <= 60 docs, so each seed runs in
 * milliseconds; the corpus shape (clones + shared boilerplate + noise)
 * is exactly the regime the compression exists for.
 */
class CompressionPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Clone-heavy corpus: ~1/3 of docs are exact copies of earlier docs,
    * the rest draw 6-14 words from a 12-word vocabulary (dense overlap). */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until n).foreach { i =>
      val text =
        if (i > 0 && rng.nextInt(3) == 0) docs(rng.nextInt(i))._2 // exact clone
        else Seq.fill(6 + rng.nextInt(9))(vocab(rng.nextInt(vocab.length))).mkString(" ")
      docs += ((i.toLong, text))
    }
    docs.toSeq
  }

  private def df(docs: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    docs.toDF("doc_id", "text")
  }

  // --- plain-Scala references (independent of any Spark operator) ---

  /** 60-bit simhash of a doc's word set, mirroring the documented
    * fingerprint contract (xxhash64 word hash, sum of +-1 bits). The hash
    * function must match the operator's — take it from the operator's own
    * fingerprint output, NOT reimplemented, so this reference pins the
    * PAIRING/COMPONENT logic (the compressed part), not the hash. */
  private def fingerprints(docs: Seq[(Long, String)]): Map[Long, Long] =
    Dedup.simhashFingerprints(df(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("simhashNearDups == brute-force hamming pairs across seeds (clone-heavy corpora)") {
    (1L to 5L).foreach { seed =>
      val docs = corpus(seed, 50)
      val fps = fingerprints(docs)
      val expected = (for {
        i <- docs.indices; j <- (i + 1) until docs.size
        a = docs(i)._1; b = docs(j)._1
        h = hamming(fps(a), fps(b)) if h <= 3
      } yield (a, b, h)).toSet
      val got = Dedup.simhashNearDups(df(docs), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected,
        s"seed=$seed: only-expected=${(expected -- got).take(5)} " +
          s"only-got=${(got -- expected).take(5)}")
      assert(expected.nonEmpty, s"seed=$seed produced no pairs — corpus too sparse")
    }
  }

  test("simhashComponents == brute-force union-find across seeds") {
    (1L to 5L).foreach { seed =>
      val docs = corpus(seed, 50)
      val fps = fingerprints(docs)
      val pairs = for {
        i <- docs.indices; j <- (i + 1) until docs.size
        a = docs(i)._1; b = docs(j)._1
        if hamming(fps(a), fps(b)) <= 3
      } yield (a, b)
      // union-find with min-label finish
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = nodes.map(n => n -> find(n)).toSet
      val got = Dedup.simhashComponents(df(docs), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"seed=$seed: only-expected=${(expected -- got).take(5)} " +
          s"only-got=${(got -- expected).take(5)}")
    }
  }

  test("df-capped jaccardPairs == brute-force set jaccard with candidate gating, across seeds") {
    (1L to 5L).foreach { seed =>
      val docs = corpus(seed, 40)
      val n = 2 // bigram shingles keep >= n-word docs in play
      def shingleSet(t: String): Set[String] = {
        val w = t.split(" ")
        (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      val maxDf = 6
      val df_ = sets.values.toSeq.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
      val indexed = sets.map { case (id, ss) => id -> ss.filter(s => df_(s) <= maxDf) }
      val threshold = 0.3
      val expected = (for {
        i <- docs.indices; j <- (i + 1) until docs.size
        a = docs(i)._1; b = docs(j)._1
        // candidate: share >= 1 NON-STOP shingle (the df-capped index gate)
        if (indexed(a) & indexed(b)).nonEmpty
        jac = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
        if jac >= threshold
      } yield (a, b, math.rint(jac * 10000) / 10000)).toSet
      val got = Dedup.jaccardPairs(Dedup.ngramShingles(df(docs), n), threshold, maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"seed=$seed: only-expected=${(expected -- got).take(5)} " +
          s"only-got=${(got -- expected).take(5)}")
      assert(expected.nonEmpty, s"seed=$seed produced no pairs")
    }
  }
}
