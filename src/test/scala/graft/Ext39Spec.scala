package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{ConnectedComponents, Dedup, Tables}

class Ext39Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("simhashComponents == components(simhashNearDups) — rep-graph CC is exact") {
    val docs = Tables.table(spark, sfDir, "documents")
    val direct = ConnectedComponents.components(Dedup.simhashNearDups(docs, 3))
      .select(col("node").cast("long"), col("comp").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val compressed = Dedup.simhashComponents(docs, 3)
      .select(col("node"), col("comp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(compressed == direct,
      s"rep-graph CC diverged: only-direct=${(direct -- compressed).take(5)} " +
        s"only-compressed=${(compressed -- direct).take(5)}")
    assert(direct.nonEmpty, "fixture must exercise at least one near-dup pair")
  }

  test("dedup_sample_weights: weights bounded, singleton sources sum to n*1e6") {
    val out = SparkEntry.queries("dedup_sample_weights")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val eff = r.getAs[Long]("effective_ppm_sum")
      // every weight is in (0, 1e6]: the ppm sum is positive and at most n*1e6
      assert(eff > 0 && eff <= n * 1000000L, s"row $r out of bounds")
      val mean = r.getAs[Long]("mean_weight_ppm")
      assert(mean == eff / n)
    }
  }

  test("token_dedup_savings: kept <= total, savings consistent") {
    val out = SparkEntry.queries("token_dedup_savings")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val total = r.getAs[Long]("total_tokens")
      val kept = r.getAs[Long]("kept_tokens")
      val saved = r.getAs[Long]("saved_pm")
      assert(kept >= 0 && kept <= total)
      assert(saved == (total - kept) * 1000 / total)
    }
    // dedup must save SOMETHING somewhere on this fixture (it has dup docs)
    assert(out.map(_.getAs[Long]("saved_pm")).sum > 0)
  }

  test("quality_gate_by_source: keeps ~top 30% per source, gate is a real score") {
    val out = SparkEntry.queries("quality_gate_by_source")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_total")
      val kept = r.getAs[Long]("n_kept")
      assert(kept <= n)
      // percent_rank >= 0.7 keeps ceil(0.3*(n-1)) .. ~30% + 1 of each source
      if (n > 3) assert(kept >= 1 && kept <= n * 4 / 10 + 1, s"row $r")
    }
  }
}
