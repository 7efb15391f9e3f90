package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{ConnectedComponents, Dedup, Tables}

/** Semantic cross-checks for the round-9 second wave. */
class Ext42Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("minhashComponents == doc-grain CC over minhashNearDups pairs") {
    val docs = Tables.table(spark, sfDir, "documents")
    // the rep-graph contraction must produce EXACTLY the components the
    // uncompressed doc-grain edge list (cliques included) produces
    val docGrain = ConnectedComponents.components(
        Dedup.minhashNearDups(docs, 0.9).select(col("doc_a"), col("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repGrain = Dedup.minhashComponents(docs, 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repGrain.nonEmpty, "fixture must have at least one near-dup component")
    assert(repGrain == docGrain,
      s"rep-graph CC diverged: only-rep=${(repGrain.toSet -- docGrain.toSet).take(3)} " +
        s"only-doc=${(docGrain.toSet -- repGrain.toSet).take(3)}")
  }

  test("mix_epochs_plan: allocation conserves the 3-pass budget; flags agree with epochs") {
    val rows = ExtQueries42.queries("mix_epochs_plan")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val toks = rows.map(_.getAs[Long]("toks")).sum
    val alloc = rows.map(_.getAs[Long]("alloc_toks")).sum
    // weights sum to ~1 (each rounded to 6 places), so total allocation
    // lands within sources*rounding of 3x the corpus
    assert(math.abs(alloc - 3L * toks) <= 3L * toks / 1000,
      s"allocation $alloc far from 3x corpus ${3L * toks}")
    rows.foreach { r =>
      val pct = r.getAs[Long]("epochs_pct")
      assert(pct == r.getAs[Long]("alloc_toks") * 100 / r.getAs[Long]("toks"))
      assert(r.getAs[Boolean]("over_cap") == pct > 400)
      val uf = r.getAs[Double]("unique_frac")
      assert(uf <= 1.0 && uf > 0.0)
      if (pct >= 100) assert(uf == 1.0, s"full-epoch source must keep all unique data: $r")
    }
  }

  test("shard_rebalance_plan: moves flow surplus->deficit and never overshoot either side") {
    val bytesByShard = Tables.table(spark, sfDir, "documents")
      .groupBy(pmod(col("doc_id"), lit(16)).cast("int").as("shard"))
      .agg(sum(col("n_chars")).as("bytes"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val avg = bytesByShard.values.sum / bytesByShard.size
    val plan = ExtQueries42.queries("shard_rebalance_plan")(spark, sfDir).collect()
    assert(plan.nonEmpty, "skewed fixture must produce at least one move")
    plan.foreach { r =>
      val (from, to, moved) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(bytesByShard(from) > avg, s"move FROM non-surplus shard: $r")
      assert(bytesByShard(to) < avg, s"move TO non-deficit shard: $r")
      assert(moved > 0 && moved <= bytesByShard(from) - avg)
      assert(moved <= avg - bytesByShard(to))
    }
    // at most one move per shard on each side (i-th to i-th pairing)
    assert(plan.map(_.getInt(0)).distinct.length == plan.length)
    assert(plan.map(_.getInt(1)).distinct.length == plan.length)
  }

  test("stream_dsv2_pruned == batch pruned read over the same staged corpus") {
    val staged = ExtQueries40.stagedCsv(spark, sfDir)
    val batch = spark.read.format("graft-interactions").load(staged)
      .groupBy(col("item")).agg(count(lit(1)).as("n_events"))
      .collect().map(_.toSeq).toSet
    val stream = ExtQueries42.queries("stream_dsv2_pruned")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(stream == batch, s"streamed pruned read diverged from batch")
  }
}
