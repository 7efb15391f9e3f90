package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Similarity, Tables}

/**
 * Semantics tests for the round-4 second-wave operators (ExtQueries6):
 * invariants the row-hash oracle can't express — sessionization
 * structure, funnel monotonicity, bin balance, VQ partition
 * independence, and streaming-upsert == batch-latest equivalence.
 */
class Ext6Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("sessionize_batch: sessions partition each user's events; intra-gap <= 30min") {
    val sessions = q("sessionize_batch").collect()
    val totalEvents = Tables.events(spark, sfDir).count()
    assert(sessions.map(_.getLong(2)).sum == totalEvents,
      "session event counts must partition the event set")
    // per user: session ids are 1..n and start/end windows are ordered
    // and separated by more than the 30-min gap
    sessions.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byId = rows.sortBy(_.getLong(1))
      assert(byId.map(_.getLong(1)).toSeq == (1L to byId.length).toSeq)
      byId.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = java.time.LocalDateTime.parse(a.getString(4).replace(' ', 'T'))
          val bStart = java.time.LocalDateTime.parse(b.getString(3).replace(' ', 'T'))
          // formatted seconds truncate sub-second parts: allow equality slack of 1s
          assert(java.time.Duration.between(aEnd, bStart).getSeconds >= 1800 - 1,
            s"sessions must be separated by > 30min (got $aEnd -> $bStart)")
        case _ => ()
      }
      byId.foreach { r =>
        assert(r.getString(3) <= r.getString(4), "session start <= end")
      }
    }
  }

  test("funnel_steps: step counts are monotone non-increasing") {
    val r = q("funnel_steps").collect().head
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2),
      s"funnel must narrow: $r")
  }

  test("quantile_bins: counts cover the table and bins are ordered/balanced") {
    val bins = q("quantile_bins").collect().sortBy(_.getInt(0))
    val n = Tables.table(spark, sfDir, "orders").count()
    assert(bins.map(_.getLong(1)).sum == n)
    // deciles from exact interpolated percentiles: every bin within 2x
    // of the ideal share (ties can shift boundary mass)
    bins.foreach { b =>
      assert(b.getLong(1) <= n * 2 / 10 + 1, s"bin too heavy: $b")
    }
    bins.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2),
        s"bin ranges must be ordered: $a | $b")
      case _ => ()
    }
  }

  test("vq_assign: partition-independent and truly the argmin code") {
    val assign = q("vq_assign").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute brute-force in Scala on the same quantized grid
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val codes = emb.filter(_._1 % 64 == 0)
    emb.foreach { case (id, v) =>
      val best = codes.map { case (cid, c) =>
        val d = v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, cid)
      }.minBy(identity)
      assert(assign(id) == ((best._2, best._1)), s"vec $id: ${assign(id)} != $best")
    }
  }

  test("stream_upsert_latest equals the batch latest-per-user") {
    val streamed = q("stream_upsert_latest").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val batch = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, sfDir)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          col("event_id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    }
    assert(streamed.toSeq == batch.toSeq)
  }

  test("IntervalJoin.overlapBinned equals the naive theta join, each pair once") {
    import graft.operators.IntervalJoin
    val l = spark.range(0, 200)
      .select(col("id").as("lkey"), (col("id") * 3 % 97).as("ls"))
      .withColumn("le", col("ls") + 1 + col("lkey") % 13)
    val r = spark.range(0, 50)
      .select(col("id").as("rkey"), (col("id") * 7 % 89).as("rs"))
      .withColumn("re", col("rs") + 2 + col("rkey") % 17)
    for (binWidth <- Seq(1L, 5L, 64L)) {
      val binned = IntervalJoin.overlapBinned(l, r, binWidth)
        .select(col("lkey"), col("rkey")).collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      val naive = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
        .select(col("lkey"), col("rkey")).collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      assert(binned.length == binned.distinct.length,
        s"binWidth=$binWidth emitted duplicate pairs")
      assert(binned.sorted.toSeq == naive.sorted.toSeq,
        s"binWidth=$binWidth: ${binned.length} pairs vs naive ${naive.length}")
    }
  }

  test("IntervalJoin.overlapBinned: randomized equivalence (seeded), incl. touching endpoints") {
    import graft.operators.IntervalJoin
    for (seed <- Seq(7, 42, 1337); binWidth <- Seq(3L, 17L)) {
      val rnd = new scala.util.Random(seed)
      // adversarial mix: zero-length-adjacent, nested, far-apart intervals
      val ls = (0 until 300).map { i =>
        val s = rnd.nextInt(400).toLong; (i.toLong, s, s + 1 + rnd.nextInt(40).toLong)
      }
      val rs = (0 until 80).map { i =>
        val s = rnd.nextInt(400).toLong; (i.toLong, s, s + 1 + rnd.nextInt(60).toLong)
      }
      val l = spark.createDataFrame(ls).toDF("lkey", "ls", "le")
      val r = spark.createDataFrame(rs).toDF("rkey", "rs", "re")
      val binned = IntervalJoin.overlapBinned(l, r, binWidth)
        .select(col("lkey"), col("rkey")).collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      val naive = ls.flatMap { case (lk, a, b) =>
        rs.collect { case (rk, c, d) if a < d && c < b => (lk, rk) }
      }
      assert(binned.length == binned.distinct.length, s"seed=$seed w=$binWidth dup pairs")
      assert(binned.sorted.toSeq == naive.sorted,
        s"seed=$seed w=$binWidth: ${binned.length} vs ${naive.length}")
    }
  }

  test("text_entropy: bounded by 0 and log2(n_distinct-ish upper bound)") {
    q("text_entropy").collect().foreach { r =>
      val n = r.getLong(1)
      val h = r.getDouble(2)
      assert(h >= -1e-9, s"entropy must be >= 0: $r")
      assert(h <= math.log(n.toDouble) / math.log(2.0) + 1e-9,
        s"entropy must be <= log2(n): $r")
    }
  }
}
