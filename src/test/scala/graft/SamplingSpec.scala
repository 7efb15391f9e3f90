package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Cooccurrence, Sampling}

/**
 * Sampling-mode pipeline semantics (reference:
 * ItemInteractionCounterTwoInputStreamOperator, UserInteractionCounter
 * OneInputStreamOperator): cut bounds, refund cycle, and the reference's
 * own equivalence property — cuts >= data size reduces to the exact
 * skip-cuts result.
 */
class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private val DayMs = 86400000L
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

  private def inter = Cooccurrence.interactions(spark, sfDir)

  test("tiny handmade fixture: cooc matrix and row sums match hand computation (FIXTURES §1)") {
    // Window 0 (ts 0-99):   u1: 1@1, 2@2     -> +1 on (1,2),(2,1)
    //                       u2: 1@3, 3@4     -> +1 on (1,3),(3,1)
    // Window 1 (ts 100-199): u1: 3@101, history [1,2] -> +1 on (3,1),(1,3),(3,2),(2,3)
    //                        u3: 2@102, 3@103 -> +1 on (3,2),(2,3)
    // C: (1,2)=1 (2,1)=1 (1,3)=2 (3,1)=2 (2,3)=2 (3,2)=2; row sums 1->3, 2->3, 3->4
    val rows = Seq(
      (1, 1, 1L), (1, 2, 2L), (2, 1, 3L), (2, 3, 4L),
      (1, 3, 101L), (3, 2, 102L), (3, 3, 103L))
    val df = spark.createDataFrame(rows).toDF("user", "item", "ms")
      .select(col("user"), col("item"), timestamp_millis(col("ms")).as("ts"))
    val counts = Sampling.sampledCoocCounts(df,
        fMax = 100, kMax = 100, seed = 42L, windowMs = 100L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expected = Map(
      (1, 2) -> 1L, (2, 1) -> 1L, (1, 3) -> 2L,
      (3, 1) -> 2L, (2, 3) -> 2L, (3, 2) -> 2L)
    assert(counts == expected, s"got $counts")
    // skip-cuts batch algebra agrees on the same fixture
    val batch = Cooccurrence.coocCounts(df.select(col("user"), col("item"), col("ts")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(batch == expected, s"got $batch")
    val sums = Cooccurrence.rowSums(Cooccurrence.coocCounts(df))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sums == Map(1 -> 3L, 2 -> 3L, 3 -> 4L), s"got $sums")
  }

  test("negative user/item ids route safely through the tag-bit synthetic keys") {
    // 4 windows, users -5 and 2, items -7 and 3: each user appends -7
    // then 3, so each contributes one symmetric (3,-7) pair. A key
    // collision between a negative id and a synthetic passthrough key
    // would corrupt the fold routing and break this exact expectation.
    val rows = Seq(
      (-5, -7, 1000L), (-5, 3, 2000L), (2, -7, 3000L), (2, 3, 90000000L))
    val df = spark.createDataFrame(rows).toDF("user", "item", "ms")
      .select(col("user"), col("item"), timestamp_millis(col("ms")).as("ts"))
    val counts = Sampling.sampledCoocCounts(df, fMax = 10, kMax = 2, 42L, 100L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(counts == Map((3, -7) -> 2L, (-7, 3) -> 2L), s"got $counts")
    val again = Sampling.sampledCoocCounts(df.repartition(5), fMax = 10, kMax = 2, 42L, 100L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(again == counts)

    // third event per user exceeds kMax -> the sequential multi-window
    // loop runs (reservoir + refunds live); negative ids must still be
    // deterministic under repartitioning
    val rows3 = rows ++ Seq((-5, 9, 95000000L), (2, 9, 96000000L))
    val df3 = spark.createDataFrame(rows3).toDF("user", "item", "ms")
      .select(col("user"), col("item"), timestamp_millis(col("ms")).as("ts"))
    val c1 = Sampling.sampledCoocCounts(df3, fMax = 10, kMax = 2, 42L, 100L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val c2 = Sampling.sampledCoocCounts(df3.repartition(3), fMax = 10, kMax = 2, 42L, 100L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(c1 == c2 && c1.nonEmpty)
  }

  test("cuts >= data size: sampled co-occurrence counts == skip-cuts batch counts exactly") {
    val batch = Cooccurrence.coocCounts(inter).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val sampled = Sampling.sampledCoocCounts(inter, 1000000, 1000000, 42L, DayMs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(sampled == batch)
  }

  test("deterministic under repartitioning (seeded per-(user,window) RNG + canonical order)") {
    val d1 = Sampling.sampledCoocDeltas(inter, 60, 20, 42L, DayMs)
      .groupBy("item", "other").agg(sum("inc").as("c")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val d2 = Sampling.sampledCoocDeltas(inter.repartition(11), 60, 20, 42L, DayMs)
      .groupBy("item", "other").agg(sum("inc").as("c")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(d1 == d2)
    assert(d1.nonEmpty)
  }

  test("cut bounds hold: no negative cells, row width bounded, deltas bounded by 2*kMax per event") {
    val kMax = 20
    val counts = Sampling.sampledCoocCounts(inter, 60, kMax, 42L, DayMs)
    val cells = counts.collect()
    assert(cells.forall(_.getLong(2) > 0))
    val nEvents = inter.count()
    val totalMass = cells.map(_.getLong(2)).sum
    // append path emits <= 2*(kMax-1) deltas per event; reservoir swaps net 0
    assert(totalMass <= 2L * kMax * nEvents)
  }

  test("metrics parity: observedCooccurrences == append-path delta mass; counters consistent") {
    val m = new Sampling.PipelineMetrics(spark.sparkContext)
    // no cuts -> every event appends; observed == total delta emissions
    val mass = Sampling.sampledCoocDeltas(inter, 1000000, 1000000, 42L, DayMs, Some(m))
      .agg(sum(abs(col("inc")))).head.getLong(0)
    assert(m.observedCooccurrences.value == mass)
    assert(m.sampledInteractions.value == inter.count())
    assert(m.droppedInteractions.value == 0L)
    assert(m.feedbackElements.value == 0L)
    // with cuts: drops and refunds appear
    val m2 = new Sampling.PipelineMetrics(spark.sparkContext)
    Sampling.sampledCoocDeltas(inter, 5, 3, 42L, DayMs, Some(m2))
      .agg(count(lit(1))).head.getLong(0)
    assert(m2.droppedInteractions.value > 0L)
    assert(m2.sampledInteractions.value > 0L)
  }

  test("empty input: sampled pipeline returns an empty delta set, no NPE from agg(max)") {
    val empty = inter.where(lit(false))
    assert(Sampling.sampledCoocDeltas(empty, 60, 20, 42L, DayMs).count() == 0L)
  }

  test("small cuts produce a proper subsample (strictly less mass than no cuts)") {
    val full = Cooccurrence.coocCounts(inter).agg(sum("cnt")).head.getLong(0)
    val cut = Sampling.sampledCoocCounts(inter, 60, 20, 42L, DayMs)
      .agg(sum("cnt")).head.getLong(0)
    assert(cut > 0 && cut < full)
  }
}
