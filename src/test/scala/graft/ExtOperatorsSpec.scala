package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators._

/**
 * Semantics tests for the operators whose guarantees a SQL oracle can't
 * express: LSH ANN recall, SimHash banded-join completeness, MinHash-LSH
 * candidate soundness, multimodal decode plumbing.
 */
class ExtOperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docs = Tables.table(spark, sfDir, "documents")
  private def embs = Tables.table(spark, sfDir, "embeddings")

  test("LSH ANN: results are a subset of correct scores and recall >= 0.3 vs brute force") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(embs, qids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val allScores = Similarity.bruteForceTopK(embs, qids, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approx = Similarity.lshTopK(embs, qids, 10, dims = 64, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    // every approx score is the true cosine for that pair
    approx.foreach { case (k, s) => assert(allScores(k) == s, s"score mismatch for $k") }
    // recall: LSH with 4 planes keeps ~1/16 of candidates; near-neighbors
    // land in the query's bucket far more often than random
    val recall = approx.map(_._1).count(exact.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low")
  }

  test("IVF ANN: scores exact within probed lists, recall >= 0.3, deterministic") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(embs, qids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val allScores = Similarity.bruteForceTopK(embs, qids, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf1 = IvfIndex.ivfTopK(embs, qids, 10, nLists = 16, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    val ivf2 = IvfIndex.ivfTopK(embs.repartition(9), qids, 10, nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(ivf1.toMap == ivf2.toMap, "IVF must be partition-independent")
    ivf1.foreach { case (key, s) => assert(allScores(key) == s) }
    val recall = ivf1.map(_._1).count(exact.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low")
  }

  test("banded embedding LSH dedup: sound (exact scores, subset), near-1 recall on true near-dups, partition-independent") {
    val exactPairs = Dedup.embeddingNearDups(embs, 0.30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh1 = Dedup.embeddingNearDupsLsh(embs, 0.30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    val lsh2 = Dedup.embeddingNearDupsLsh(embs.repartition(7), 0.30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh1.toMap == lsh2.toMap, "banded LSH dedup must be partition-independent")
    assert(lsh1.length == lsh1.toMap.size, "each pair must be emitted exactly once")
    // soundness: every emitted pair is a true pair with the exact score
    lsh1.foreach { case (k, s) =>
      assert(exactPairs.get(k).contains(s), s"pair $k not in exact set or score drifted") }
    // recall on TRUE near-dups (cos >= 0.9): tight pairs collide in some
    // band almost surely; moderate-cos pairs are allowed to be missed
    val tight = exactPairs.filter(_._2 >= 0.9).keySet
    if (tight.nonEmpty) {
      val got = lsh1.map(_._1).toSet
      val recall = tight.count(got.contains).toDouble / tight.size
      assert(recall >= 0.8, s"near-dup recall $recall too low (${tight.size} tight pairs)")
    }
    // the query-surface config (dedup_embedding, 4 bands) must be sound
    // against the exact verifier AND dominate the 2-band recall — more
    // independent bands can only add colliding pairs
    val hi = Dedup.embeddingNearDupsLsh(embs, 0.30, nBands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(hi.length == hi.toMap.size, "4-band: each pair emitted exactly once")
    hi.foreach { case (k, s) =>
      assert(exactPairs.get(k).contains(s), s"4-band pair $k not exact") }
    assert(lsh1.map(_._1).toSet.subsetOf(hi.map(_._1).toSet),
      "4-band candidate set must contain the 2-band set (bands 0-1 are shared)")
  }

  test("SimHash banded join finds EVERY pair within hamming <= 3 (pigeonhole)") {
    val fps = Dedup.simhashFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h)).toSet
    val got = Dedup.simhashNearDups(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "calibration: testdata should contain simhash near-dups")
  }

  test("MinHash-LSH near-dups: sound (every pair truly >= threshold), deterministic across runs") {
    val r1 = Dedup.minhashNearDups(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val r2 = Dedup.minhashNearDups(docs.repartition(7), 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(r1 == r2, "partitioning must not change the result")
    assert(r1.nonEmpty)
    assert(r1.forall(_._3 >= 0.9))
  }

  test("df-capped inverted index: emitted pairs are exact and a subset; generous cap is lossless") {
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sh = Dedup.ngramShingles(docs, 3)
    val full = toSet(Dedup.jaccardPairs(sh, 0.1))
    val capped = toSet(Dedup.jaccardPairs(sh, 0.1, maxDf = 2))
    val generous = toSet(Dedup.jaccardPairs(sh, 0.1, maxDf = 1000000))
    assert(capped.subsetOf(full), "capped candidates must never invent pairs")
    assert(generous == full, "a cap above every df must be lossless")
    // exactness: every capped pair carries the same jaccard as the full run
    capped.foreach(p => assert(full.contains(p)))
  }

  test("approx_percentile sketch: within rank-error bound of the exact percentiles") {
    import org.apache.spark.sql.functions._
    val li = Tables.table(spark, sfDir, "lineitem")
    // the query itself now emits oracle-checkable in-band flags; the raw
    // sketch values for the direct rank-error check come from here
    val approx = li.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // accuracy=10000 bounds the RANK error at n/10000; translate to a
    // value check by verifying the approx value's true rank is within
    // the bound of the requested quantile's rank
    approx.foreach { case (flag, (p50, p95)) =>
      val vals = li.where(col("l_returnflag") === flag)
        .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
      val n = vals.length
      def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / n
      assert(math.abs(rankOf(p50) - 0.5) <= 0.01 + 1.0 / n, s"$flag p50=$p50 rank=${rankOf(p50)}")
      assert(math.abs(rankOf(p95) - 0.95) <= 0.01 + 1.0 / n, s"$flag p95=$p95 rank=${rankOf(p95)}")
    }
  }

  test("approx_count_distinct sketch: relative error < 5% vs exact") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val rows = li.groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(
        org.apache.spark.sql.functions.approx_count_distinct(
          org.apache.spark.sql.functions.col("l_orderkey")).as("a"),
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("l_orderkey")).as("e"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      // default HLL++ rsd is 0.05 (one standard deviation) — bound at 2 sigma
      assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
    }
  }

  test("deterministic split: partition-independent assignment, rates near 10/10/80") {
    import org.apache.spark.sql.functions._
    val d = docs.select(col("doc_id"))
    val a = DeterministicSample.split(d, col("doc_id").cast("string"), 10, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = DeterministicSample.split(d.repartition(7), col("doc_id").cast("string"), 10, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.10) < 0.06, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.10) < 0.06, frac.toString)
    assert(frac.getOrElse("train", 0.0) > 0.7, frac.toString)
  }

  test("decontamination: bloom-gated path == broadcast anti-join path (exact in both regimes)") {
    import org.apache.spark.sql.functions._
    val d = docs.select(col("doc_id"), col("text"))
    val eval = docs.where(col("doc_id") % 10 === 3).select(col("text"))
    val viaBroadcast = Dedup.decontaminate(d, eval)
      .collect().map(_.getLong(0)).toSet
    val viaBloom = Dedup.decontaminate(d, eval, broadcastLimit = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(viaBroadcast == viaBloom && viaBroadcast.nonEmpty)
  }

  test("count-min sketch estimates: exact <= est <= exact + eps*N for every heavy hitter") {
    import org.apache.spark.sql.functions._
    // the query itself now emits oracle-checkable bound flags; the raw
    // sketch estimates for the tight 1x-eps check come from here
    val keys = Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").cast("string").as("key"))
      .where(col("key").isNotNull)
    val bytes = keys
      .agg(count_min_sketch(col("key"), lit(0.0001), lit(0.99), lit(42)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val rows = graft.operators.HeavyHitters.exact(keys, col("key"), 20).collect()
    assert(rows.nonEmpty)
    val n = Tables.events(spark, sfDir).count()
    val slack = math.max(1L, (0.0001 * n).ceil.toLong)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = cms.estimateCount(r.getString(0))
      assert(est >= exact, s"CMS must never underestimate: $r est=$est")
      assert(est <= exact + slack, s"CMS overestimate beyond eps*N: $r est=$est (slack $slack)")
    }
  }

  test("multimodal decode stub: features derive from payload bytes, schema is typed") {
    val feats = Multimodal.mediaFeatures(spark, sfDir)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "width", "height", "sum_bytes", "n_frames", "frame_sig"))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    // width/height are byte-valued + 1
    assert(rows.forall { r =>
      val w = r.getInt(1); val h = r.getInt(2)
      w >= 1 && w <= 256 && h >= 1 && h <= 256 && r.getInt(4) == 4
    })
  }

  test("quantized cosine is partition-independent (exact integer arithmetic)") {
    val a = Dedup.embeddingNearDups(embs, 0.30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Dedup.embeddingNearDups(embs.repartition(13), 0.30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    assert(a.forall { case (_, _, c) => c >= 0.30 && c <= 1.0 })
  }

  test("heavy hitters: exact == plain groupBy-having, partition-independent") {
    import org.apache.spark.sql.functions._
    val items = Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").cast("string").as("item"))
    val expected = items.groupBy(col("item")).count()
      .where(col("count") >= 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.exact(items, col("item"), 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty, "threshold should select some items at sf0.001")
    val gotRepart = HeavyHitters.exact(items.repartition(13), col("item"), 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotRepart == expected)
  }

  test("GraftExtensions: llr available as a native SQL function (Dunning golden value)") {
    GraftExtensions.register(spark)
    val s = spark.sql("SELECT llr(110, 2442, 111, 29114) AS s").head.getDouble(0)
    assert(math.abs(s - 270.72) < 0.1)
    // native expression, not a UDF: plan must not contain a ScalaUDF node
    val plan = spark.sql("SELECT llr(1, 2, 3, 4)").queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("GraftExtensions: long_array_dot and sorted_intersect_size as SQL functions") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head.getLong(0)
    assert(dot == 32L)
    val isz = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 3L, 5L, 9L), array(2L, 3L, 9L)) AS n")
      .head.getInt(0)
    assert(isz == 2)
  }

  test("GraftExtensions: simhash_fp as a SQL function (majority-bit semantics, default + explicit bits)") {
    GraftExtensions.register(spark)
    // elements 3 (0b11), 1 (0b01), 1: bit0 set in all 3 (3>0), bit1 in 1 of 3 (2<=3-1... 2*1<3)
    val fp = spark.sql("SELECT simhash_fp(array(3L, 1L, 1L), 2) AS fp").head.getLong(0)
    assert(fp == 1L, s"fp=$fp")
    // default 60 bits matches the explicit form
    val a = spark.sql("SELECT simhash_fp(array(7L, 5L, 4L)) AS fp").head.getLong(0)
    val b = spark.sql("SELECT simhash_fp(array(7L, 5L, 4L), 60) AS fp").head.getLong(0)
    assert(a == b)
    val plan = spark.sql("SELECT simhash_fp(array(1L))").queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("hash-gated sampling: partition-independent selected set, ~pct rate, stratified rates hold") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val key = col("event_id").cast("string")
    val s1 = DeterministicSample.bernoulli(ev, key, 10)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val s2 = DeterministicSample.bernoulli(ev.repartition(17), key, 10)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "selected set must not depend on partitioning")
    val n = ev.count().toDouble
    assert(s1.size > 0.05 * n && s1.size < 0.16 * n,
      s"rate ${s1.size / n} should be near 0.10")
    // stratified: a 0%-rate stratum is empty, a 100%-rate stratum is complete
    val rates = Map("click" -> 0, "purchase" -> 100)
    val got = DeterministicSample.stratified(ev, col("event_type"), key, rates, 0)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("click"))
    val nPurchase = ev.where(col("event_type") === "purchase").count()
    assert(got.getOrElse("purchase", 0L) == nPurchase)
  }
}
