package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators._

/**
 * Empty-input and degenerate-input behavior: every operator must return
 * an empty (or identity) result, not throw — the round-1 advisory found
 * exactly this class of bug (agg(max) over an empty input yields one
 * NULL row that a non-nullable encoder rejects).
 */
class EdgeCaseSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def emptyDocs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def emptyInteractions = {
    val schema = StructType(Seq(
      StructField("user", IntegerType), StructField("item", IntegerType),
      StructField("ts", TimestampType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  test("dedup operators: empty corpus -> empty pairs, no exception") {
    assert(Dedup.exactGroups(emptyDocs).count() == 0)
    assert(Dedup.minhashNearDups(emptyDocs, 0.8).count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, 3).count() == 0)
    assert(Dedup.jaccardPairs(Dedup.ngramShingles(emptyDocs, 3), 0.1).count() == 0)
    assert(Dedup.jaccardPairs(Dedup.ngramShingles(emptyDocs, 3), 0.1, maxDf = 5).count() == 0)
  }

  test("single-doc corpus -> no pairs (nothing to pair with)") {
    val one = spark.createDataFrame(Seq((1L, "alpha beta gamma delta"))).toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(one, 0.5).count() == 0)
    assert(Dedup.simhashNearDups(one, 3).count() == 0)
    assert(Dedup.jaccardPairs(Dedup.ngramShingles(one, 3), 0.1, maxDf = 5).count() == 0)
  }

  test("sampled pipeline: empty interactions -> empty deltas (the advisory's null-agg case)") {
    val out = Sampling.sampledCoocDeltas(emptyInteractions,
      fMax = 10, kMax = 10, seed = 42L, windowMs = 86400000L)
    assert(out.count() == 0)
  }

  test("heavy hitters: empty input and all-null keys -> empty result") {
    val empty = emptyDocs.select(col("text"))
    assert(HeavyHitters.exact(empty, col("text"), 1).count() == 0)
    val nulls = spark.createDataFrame(Seq(Tuple1(null: String), Tuple1(null: String)))
      .toDF("k")
    assert(HeavyHitters.exact(nulls, col("k"), 1).count() == 0)
  }

  test("prefix scan: empty input -> empty output; single row -> null prefix") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assert(PrefixScan.runningMaxExclusive(empty, "id", "v", "wm").count() == 0)
    val one = spark.createDataFrame(Seq((1L, 7.0))).toDF("id", "v")
    val rows = PrefixScan.runningMaxExclusive(one, "id", "v", "wm").collect()
    assert(rows.length == 1 && rows.head.isNullAt(rows.head.fieldIndex("wm")))
  }

  test("runningSumExclusive matches a driver-side cumsum on shuffled unique keys") {
    val rng = new scala.util.Random(42)
    val rows = rng.shuffle((0 until 500).toList).map(i => (i.toLong, rng.nextInt(100).toLong))
    val df = spark.createDataFrame(rows).toDF("id", "v").repartition(7)
    val got = PrefixScan.runningSumExclusive(df, "id", "v", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("cum"))).toMap
    var run = 0L
    val expected = rows.sortBy(_._1).map { case (id, v) =>
      val o = id -> run; run += v; o
    }.toMap
    assert(got == expected)
  }

  test("docs with fewer words than the shingle size emit no shingles") {
    val short = spark.createDataFrame(Seq((1L, "one two"), (2L, ""))).toDF("doc_id", "text")
    assert(Dedup.ngramShingles(short, 3).count() == 0)
  }

  test("decontamination: empty eval set keeps everything; eval == corpus keeps nothing") {
    val docs = spark.createDataFrame(Seq((1L, "alpha"), (2L, "beta"))).toDF("doc_id", "text")
    val none = docs.where(org.apache.spark.sql.functions.lit(false)).select(col("text"))
    assert(Dedup.decontaminate(docs, none).count() == 2)
    assert(Dedup.decontaminate(docs, docs.select(col("text"))).count() == 0)
  }

  test("frame sampling: payloads shorter than the frame count produce empty frames, no crash") {
    val media = spark.createDataFrame(Seq(
        (1L, Array[Byte](1, 2)), (2L, Array.empty[Byte])))
      .toDF("doc_id", "payload")
    val frames = Multimodal.frameSample(media, 4).collect()
    assert(frames.length == 8)
    assert(frames.filter(_.doc_id == 2L).forall(_.frame_bytes.isEmpty))
  }

  test("stream_global_agg on an empty events stream emits the oracle's single zero-row") {
    // empty dir -> no files match -> AvailableNow runs no data microbatch
    // -> memory sink stays empty; the query must still emit the batch
    // oracle's one global-aggregate row
    val tmp = java.nio.file.Files.createTempDirectory("graft_empty_ev").toString
    val rows = graft.ExtQueries4.queries("stream_global_agg")(spark, tmp).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 0L && rows.head.isNullAt(1))
  }

  test("connected components: empty pair set -> empty labels, no iteration blow-up") {
    val schema = StructType(Seq(
      StructField("doc_a", LongType), StructField("doc_b", LongType)))
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assert(ConnectedComponents.components(empty).count() == 0)
  }

  test("connected components: self-loop pairs are harmless") {
    val p = spark.createDataFrame(Seq((1L, 1L), (1L, 2L))).toDF("doc_a", "doc_b")
    val got = ConnectedComponents.components(p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("BPE: empty corpus -> zero merges, empty encode, no exception") {
    val merges = BpeTrainer.train(emptyDocs, 5)
    assert(merges.isEmpty)
    assert(BpeTrainer.encode(emptyDocs, merges).count() == 0L)
    assert(BpeTrainer.merges(emptyDocs, 5).count() == 0L)
  }

  test("BPE: single-char single word corpus merges char with end marker then stops") {
    val docs = spark.createDataFrame(Seq((1L, "a a a"))).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, 5)
    assert(merges.length == 1 &&
      merges.head.left == "a" && merges.head.right == BpeTrainer.EndMark)
    val enc = BpeTrainer.encode(docs, merges).collect()
    assert(enc.length == 1 && enc.head.getLong(1) == 3L) // 3 words x 1 token
  }

  test("sampled pipeline: pathological window config (1 ms windows over a long range) fails loudly") {
    // 1.1M rows, one per millisecond, windowMs=1 -> 1.1M distinct window
    // ids; the driver-side window-id collect must refuse (>1e6 bound)
    // instead of materializing millions of ids
    val inter = spark.range(1100000L)
      .select(col("id").cast("int").as("user"), lit(1).as("item"),
        timestamp_millis(col("id")).as("ts"))
    val ex = intercept[IllegalArgumentException] {
      Sampling.sampledCoocDeltas(inter, 0, 0, seed = 1L, windowMs = 1L).count()
    }
    assert(ex.getMessage.contains("windowMs"))
  }

  test("interval join: empty/inverted intervals raise instead of descending-sequence fan-out") {
    val left = spark.createDataFrame(Seq((5L, 5L, "a"))).toDF("ls", "le", "lv") // empty: ls == le
    val right = spark.createDataFrame(Seq((0L, 10L, "b"))).toDF("rs", "re", "rv")
    val ex = intercept[Throwable] {
      IntervalJoin.overlapBinned(left, right, 10L).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("empty, inverted, or null interval"))))
  }
}
