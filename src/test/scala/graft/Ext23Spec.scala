package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-checks for the round-7 curation wave (ExtQueries23). */
class Ext23Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("rrf_fusion: fused top-20 is plausible and rank-consistent") {
    val rows = ExtQueries23.queries("rrf_fusion")(spark, sfDir).collect()
    assert(rows.length == 20)
    // every fused score equals the two-term RRF identity of its ranks
    rows.foreach { r =>
      val ra = r.getAs[Int]("ra"); val rb = r.getAs[Int]("rb")
      val expect = BigDecimal(1.0 / (60 + ra) + 1.0 / (60 + rb))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-12)
    }
    // a doc ranked #1 by both systems must be in the fused top set
    val best = rows.minBy(r => r.getAs[Int]("ra") + r.getAs[Int]("rb"))
    assert(best.getAs[Double]("rrf") >= rows.map(_.getAs[Double]("rrf")).min)
  }

  test("source_cap: kept counts respect the cap and keep the corpus otherwise") {
    val rows = ExtQueries23.queries("source_cap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(n, 40L))
      assert(r.getAs[Long]("chars_after") <= r.getAs[Long]("chars_before"))
    }
  }

  test("source_cap kept set is partitioning-invariant (hash order, not row order)") {
    import graft.operators.PortableHash
    def ledger(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("hv"), col("doc_id"))
      df.withColumn("hv",
          PortableHash.hMod(concat(lit("cap|"), col("doc_id").cast("string"))))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 40)
        .select(col("source"), col("doc_id"))
        .collect().map(_.toSeq).toSet
    }
    val docs = graft.operators.Tables.table(spark, sfDir, "documents")
    // three materially different physical layouts of the same rows:
    // the scan order, a random 13-way shuffle, and a reversed sort —
    // the hash rank must select the identical kept set from each
    val a = ledger(docs)
    val b = ledger(docs.repartition(13, col("doc_id")))
    val c = ledger(docs.orderBy(col("doc_id").desc).repartition(3))
    assert(a == b && b == c)
    assert(a.nonEmpty)
  }

  test("winsorize_stats: cuts bound the clipped sum between min*n and max*n") {
    val rows = ExtQueries23.queries("winsorize_stats")(spark, sfDir).collect()
    assert(rows.length >= 2) // returnflag has >= 2 values
    rows.foreach { r =>
      val lo = r.getAs[Double]("lo_cut"); val hi = r.getAs[Double]("hi_cut")
      val n = r.getAs[Long]("n_rows")
      assert(lo <= hi)
      val s = r.getAs[Double]("sum_winsorized")
      assert(s >= lo * n - 1e-6 && s <= hi * n + 1e-6)
      // ~5% clipped on each side (rank arithmetic: at most ceil(5% n))
      assert(r.getAs[Long]("n_clip_low") <= (n * 5 + 99) / 100)
      assert(r.getAs[Long]("n_clip_high") <= n - (n * 95 + 99) / 100 + 1)
    }
  }

  test("dedup_normalized merges planted formatting-only duplicates") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello  world"),   // same after normalization
      (3L, "HELLO WORLD."),   // same after normalization
      (4L, "something else")
    ).toDF("doc_id", "text")
    val d = docs
      .withColumn("raw_h", md5(col("text").cast("binary")))
      .withColumn("norm",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
    val groups = d.groupBy(col("norm"))
      .agg(count(lit(1)).as("n"), countDistinct(col("raw_h")).as("nr"))
      .where(col("n") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[String]("norm") == "hello world")
    assert(groups.head.getAs[Long]("n") == 3L)
    assert(groups.head.getAs[Long]("nr") == 3L)
  }

  test("epoch_shuffle: shards partition the corpus and checksums are stable") {
    val q = ExtQueries23.queries("epoch_shuffle")(spark, sfDir)
    val rows = q.collect()
    assert(rows.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 8).toSet))
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.operators.Tables.table(spark, sfDir, "documents").count()
    assert(total == nDocs)
    // deterministic: a second evaluation yields the identical report
    assert(q.collect().map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("source-cap quota state survives a checkpointed stop/restart") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("cap_src").toString
    val sink = Files.createTempDirectory("cap_sink").toString + "/out"
    val ckpt = Files.createTempDirectory("cap_ckpt").toString
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("doc_id", LongType),
      StructField("n_chars", LongType)))

    def runOnce(): Unit =
      graft.streaming.StreamingOps.withTransformWithStateConf(spark) {
        val admitted = spark.readStream.schema(schema).parquet(src)
          .as[graft.streaming.SourceCapProcessor.In]
          .groupByKey(_.source)
          .transformWithState(new graft.streaming.SourceCapProcessor(3),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        val q = admitted.toDF().writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }

    // run 1: A has 2 docs (under quota), B has 4 (over quota)
    Seq(("A", 1L, 10L), ("A", 2L, 10L), ("B", 10L, 10L), ("B", 11L, 10L),
      ("B", 12L, 10L), ("B", 13L, 10L))
      .toDF("source", "doc_id", "n_chars").coalesce(1)
      .write.mode("append").parquet(src)
    runOnce()
    // run 2, SAME checkpoint: A gets 3 more (only one slot left), B one more
    Seq(("A", 3L, 10L), ("A", 4L, 10L), ("A", 5L, 10L), ("B", 14L, 10L))
      .toDF("source", "doc_id", "n_chars").coalesce(1)
      .write.mode("append").parquet(src)
    runOnce()

    val out = spark.read.parquet(sink)
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    // the restored counter admits exactly one more A doc (the smallest
    // of the new batch) and no more B docs
    assert(out("A") == List(1L, 2L, 3L))
    assert(out("B") == List(10L, 11L, 12L))
  }

  test("stream_source_cap admits exactly the first K docs per source") {
    val rows = ExtQueries23.queries("stream_source_cap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.operators.Tables.table(spark, sfDir, "documents")
    val expect = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))))
      .where(col("rn") <= 40)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept_ids"),
        max(col("doc_id")).as("max_kept_id"), sum(col("n_chars")).as("chars_kept"))
      .orderBy(col("source"))
      .collect().map(_.toSeq).toSeq
    assert(rows.map(_.toSeq).toSeq == expect)
  }
}
