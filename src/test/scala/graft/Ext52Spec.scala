package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{AnnIndex, IvfIndex, Similarity}

/** Batched / filtered / range ANN serving (round 16, wave 3): the kNN
  * JOIN must agree with the per-query serve row for row, the per-list
  * pre-cut must never change the result, radius output must be exactly
  * the thresholded top-k prefix, serve-time filtering must honor the
  * predicate without losing valid candidates, and MIPS must rank by the
  * exact integer dot. */
class Ext52Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.select(col("query_id"), col("rnk"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("kNN join == per-query topK serve for the same query set (pre-cut is lossless)") {
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val joined = rows(AnnIndex.knnJoin(idx, col("vec_id").isin(qids: _*), 5, 4))
    val served = rows(AnnIndex.topK(idx, qids, 5, 4))
    assert(joined == served,
      "batched kNN join must return exactly the per-query serve results")
  }

  test("full-corpus kNN graph: every corpus vector appears as a query with contiguous ranks") {
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val n = idx.assigned.count()
    val g = AnnIndex.knnJoin(idx, lit(true), 5, 4)
    assert(g.select(col("query_id")).distinct().count() == n,
      "every vector must get a neighbor list")
    val badRanks = g.groupBy(col("query_id"))
      .agg(min(col("rnk")).as("mn"), max(col("rnk")).as("mx"),
        count(lit(1)).as("c"), countDistinct(col("rnk")).as("d"))
      .where(col("mn") =!= 1 || col("mx") =!= col("c") || col("c") =!= col("d"))
      .count()
    assert(badRanks == 0, "ranks must be contiguous from 1 per query")
  }

  test("radius = the cos >= threshold prefix of the uncapped serve ranking") {
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val minCos = 0.1
    val radius = AnnIndex.radius(idx, qids, minCos, 4, 1000)
    val full = IvfIndex.topKFrom(idx.centroids, idx.assigned, qids, Int.MaxValue, 4)
    val expected = rows(full.where(col("cos") >= minCos))
    assert(rows(radius) == expected,
      "radius output must equal the thresholded prefix of the full ranking")
    assert(radius.count() > 0, "threshold chosen to be non-vacuous on the fixture")
  }

  test("serve-time filter: no filtered-out candidate returned, no valid candidate lost") {
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val pred = col("vec_id") % 3 =!= 1
    val filtered = AnnIndex.topKFiltered(idx, qids, 10, 4, pred)
    assert(filtered.where(col("vec_id") % 3 === 1).count() == 0,
      "predicate must hold on every returned candidate")
    // reference: rank the unfiltered serve's probed candidates after the
    // same predicate — equal because both score the same candidate set
    val unfiltered = IvfIndex.topKFrom(idx.centroids, idx.assigned, qids,
      Int.MaxValue, 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    val expected = rows(unfiltered.where(pred)
      .withColumn("rnk2", row_number().over(w)).where(col("rnk2") <= 10)
      .drop("rnk").withColumnRenamed("rnk2", "rnk"))
    assert(rows(filtered) == expected,
      "pre-filter serve must equal filtering the scored candidate set")
  }

  test("external kNN join: a corpus vector posed as an external query finds itself at rank 1, cos 1.0") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    // external copies of corpus vectors under shifted ids: no stored
    // assignment to reuse, no self-exclusion — the nearest neighbor of an
    // exact copy must be the original, at exact cosine 1.0
    val q = real.where(col("vec_id").isin(qids: _*))
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
    val res = AnnIndex.knnJoinExternal(idx, q, 3, 4)
    val top1 = res.where(col("rnk") === 1).collect()
      .map(r => (r.getLong(0) - 1000000L, r.getLong(2), r.getDouble(3)))
    assert(top1.length == qids.length)
    top1.foreach { case (orig, hit, cos) =>
      assert(hit == orig, s"external copy of $orig must find $orig first, got $hit")
      assert(cos == 1.0, s"exact copy must score cos 1.0, got $cos")
    }
  }

  test("kNN join recall: batched-join hits are a subset of scored candidates with sane recall") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val pred = col("vec_id") % 17 === 3
    val exact = Similarity.bruteForceTopKWhere(real, pred, 5)
      .select(col("query_id"), col("vec_id"))
    val approx = AnnIndex.knnJoin(idx, pred, 5, 4)
      .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
    val rec = exact.join(approx, Seq("query_id", "vec_id"), "left")
      .agg((count(col("hit")) * lit(1.0) / count(lit(1))).as("recall"))
      .collect()(0).getDouble(0)
    info(f"kNN-join recall@5 = $rec%.2f")
    assert(rec >= 0.5 && rec <= 1.0,
      f"IVF join recall@5 $rec%.2f outside the sane band for nProbe=4/16")
  }

  test("probe sweep: recall non-decreasing in nProbe; each config equals a real serve at that n") {
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val sweep = AnnIndex.probeSweep(idx, qids, 10, Seq(1, 2, 4, 8))
      .orderBy(col("n_probe")).collect()
    assert(sweep.length == 4)
    val recalls = sweep.map(r => r.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must be non-decreasing in nProbe: ${recalls.mkString(", ")}")
    assert(recalls.last > 0.0, "widest config must recover something")
    // the nProbe=4 sweep row must equal the recall computed from the
    // real topKFrom serve at nProbe=4 (the sweep IS nested serves)
    val exact = rows(IvfIndex.topKFrom(idx.centroids, idx.assigned, qids, 10, 16))
      // nProbe=16 probes every list == exact ranking over the whole corpus
    val served = rows(AnnIndex.topK(idx, qids, 10, 4))
    val hit = served.count { case (q, _, v) => exact.exists(e => e._1 == q && e._3 == v) }
    val servedRecall = hit.toDouble / exact.size
    val sweepAt4 = sweep.find(_.getAs[Int]("n_probe") == 4).get.getAs[Double]("recall")
    assert(math.abs(sweepAt4 - servedRecall) < 1e-9,
      f"sweep@4 $sweepAt4%.4f must equal the real serve's recall $servedRecall%.4f")
  }

  test("index stats: vector count conserved, imbalance >= 1, extremes ordered") {
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val st = AnnIndex.indexStats(idx).collect()(0)
    assert(st.getAs[Long]("n_vectors") == idx.assigned.count())
    assert(st.getAs[Int]("n_lists") == 16)
    assert(st.getAs[Long]("n_nonempty") <= 16)
    assert(st.getAs[Long]("min_sz") <= st.getAs[Long]("max_sz"))
    assert(st.getAs[Double]("imbalance") >= 1.0 - 1e-9,
      "max list can never be below the mean")
  }

  test("MIPS-IVF (norm augmentation): every score is the exact raw dot; recall sane vs exact MIPS") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val approx = IvfIndex.mipsIvfTopK(real, qids, 10, 16, 4)
    // scores must be exact raw integer dots (the query's augmented
    // coordinate is 0, so augmentation must not leak into the surface)
    val corpus = Similarity.quantizedWithNorm(real)
    val qSide = corpus.select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val bad = approx.join(broadcast(qSide), "query_id")
      .join(corpus, "vec_id")
      .where(col("dot") =!= Similarity.dotQ(col("qqv"), col("qv")))
      .count()
    assert(bad == 0, s"$bad MIPS-IVF rows carry a non-exact raw dot")
    val exact = Similarity.bruteForceTopKDot(real, qids, 10)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = approx.select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = (hits & exact).size.toDouble / exact.size
    info(f"MIPS-IVF recall@10 = $rec%.2f")
    assert(rec >= 0.5, f"augmented-space pruning recall $rec%.2f below sanity floor")
  }

  test("MIPS ranks by exact integer dot and differs from cosine where norms demand it") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val mips = Similarity.bruteForceTopKDot(real, qids, 10)
    val corpus = Similarity.quantizedWithNorm(real)
    val qSide = corpus.select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val bad = mips.join(broadcast(qSide), "query_id")
      .join(corpus, "vec_id")
      .where(col("dot") =!= Similarity.dotQ(col("qqv"), col("qv")))
      .count()
    assert(bad == 0, "every MIPS score must be the exact integer dot of its pair")
    // monotone ranks: dot non-increasing with rank per query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rnk"))
    val nonMono = mips.withColumn("prev", lag(col("dot"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") < col("dot")).count()
    assert(nonMono == 0, "dot must be non-increasing in rank")
  }
}
