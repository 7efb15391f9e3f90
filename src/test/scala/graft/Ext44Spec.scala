package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic checks for the exact repeated-span family: positional
  * (mass-counting) semantics, self-repetition inside one doc, and the
  * boilerplate report's tie-stable ordering. */
class Ext44Spec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("ext44").toString
    val eight = "a b c d e f g h"                    // one exact 8-word span
    spark.createDataFrame(Seq(
      // doc 1 and doc 2 share the same 8 words -> their single window
      // is duplicated CROSS-doc (dup_frac 1.0 for both)
      (1L, eight),
      (2L, eight),
      // doc 3: 16 words = the span twice -> 9 windows; windows at
      // positions 0 and 8 are the repeated span (each other + docs 1/2);
      // the 7 straddling windows are unique -> n_dup = 2, frac 2/9
      (3L, s"$eight $eight"),
      // doc 4: 9 unique words -> 2 windows, nothing repeated anywhere
      (4L, "p q r s t u v w x"),
      // doc 5: 7 words -> too short for any window, absent from output
      (5L, "a b c d e f g")
    )).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dup_frac counts positional mass, including self-repetition") {
    val got = ExtQueries44.queries("text_dup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(got == List(
      (1L, 1L, 1L, 1.0),
      (2L, 1L, 1L, 1.0),
      (3L, 9L, 2L, math.rint(2.0 / 9 * 10000) / 10000),
      (4L, 2L, 0L, 0.0)), s"got $got")
  }

  test("top-spans report: occurrence mass + doc reach, spans under 2 occ dropped") {
    val got = ExtQueries44.queries("text_top_spans")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // "a b c d e f g h" occurs 4 times (docs 1, 2, and twice in 3)
    // across 3 distinct docs; every other span occurs once
    assert(got == List(("a b c d e f g h", 4L, 3L)), s"got $got")
  }
}
