package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{AnnIndex, ConnectedComponents, Dedup}

/** SemDeDup compose: the drop list must be exactly "every duplicate
  * group keeps its min-id representative, everything else goes". */
class Ext57Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("IVF semantic-dedup drop list: reps survive, survivors are pairwise " +
      "below threshold within every block") {
    val idx = AnnIndex.ivf(spark, sfDir, 16, 3)
    val pairs = Dedup
      .embeddingNearDupsIvfCells(idx.assigned, 0.30, ExtQueries50.CellCap)
    val removedRows = ExtQueries57.queries("dedup_semantic_ivf")(spark, sfDir)
      .collect()
    assert(removedRows.nonEmpty, "the gate corpus must exercise the drop list")
    val removed = removedRows.map(_.getLong(0)).toSet
    val reps = removedRows.map(_.getLong(1)).toSet
    // min-label discipline: a representative is never dropped and always
    // precedes what it replaces
    assert(reps.intersect(removed).isEmpty)
    removedRows.foreach(r => assert(r.getLong(1) < r.getLong(0)))
    // the whole point: after the drop, no candidate pair survives with
    // both endpoints kept (every >=-threshold pair lost at least one side)
    val survivingPairs = pairs
      .where(!col("vec_a").isin(removed.toSeq: _*) &&
        !col("vec_b").isin(removed.toSeq: _*))
      .count()
    assert(survivingPairs == 0L,
      s"$survivingPairs near-dup pairs survived the drop list")
    // and dropping is minimal per group: group size == removed-in-group + 1
    val comps = ConnectedComponents.components(
      pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySize = comps.groupBy(_._2).view.mapValues(_.length).toMap
    val removedByComp = removedRows.groupBy(_.getLong(1)).view
      .mapValues(_.length).toMap
    bySize.foreach { case (comp, n) =>
      assert(removedByComp.getOrElse(comp, 0) == n - 1,
        s"component $comp of size $n must drop exactly ${n - 1}")
    }
  }
}
