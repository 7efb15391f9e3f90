package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic checks for the exact repeated-span family: positional
  * (mass-counting) semantics, self-repetition inside one doc, the
  * boilerplate report's tie-stable ordering, and the span-cut
  * transform's overlapping-window coalescing. */
class Ext44Spec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  private val eight = "a b c d e f g h" // one exact 8-word span
  private val nine = "m1 m2 m3 m4 m5 m6 m7 m8 m9" // two OVERLAPPING windows

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("ext44").toString
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
      // doc 5: 7 words -> too short for any window, absent from the
      // span reports but KEPT WHOLE by the cut transform
      (5L, "a b c d e f g"),
      // doc 6: the repeated span plus a 2-word unique tail -> exactly
      // words 0..7 covered, "y1 y2" survives the cut
      (6L, s"$eight y1 y2"),
      // docs 7/8: 9 shared words -> BOTH windows (pos 0 and pos 1) are
      // repeated and OVERLAP on words 1..7; coverage must coalesce to
      // 9 cut words, not 16
      (7L, nine),
      (8L, nine)
    )).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dup_frac counts positional mass, including self-repetition") {
    val got = ExtQueries44.queries("text_dup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    def frac(n: Int, d: Int) = math.rint(n.toDouble / d * 10000) / 10000
    assert(got == List(
      (1L, 1L, 1L, 1.0),
      (2L, 1L, 1L, 1.0),
      (3L, 9L, 2L, frac(2, 9)),
      (4L, 2L, 0L, 0.0),
      (6L, 3L, 1L, frac(1, 3)),
      (7L, 2L, 2L, 1.0),
      (8L, 2L, 2L, 1.0)), s"got $got")
  }

  test("top-spans report: occurrence mass + doc reach, spans under 2 occ dropped") {
    val got = ExtQueries44.queries("text_top_spans")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // "a b c d e f g h" occurs 5 times (docs 1, 2, 6, and twice in 3)
    // across 4 distinct docs; docs 7/8's two windows occur twice each;
    // every other span occurs once
    assert(got == List(
      (eight, 5L, 4L),
      ("m1 m2 m3 m4 m5 m6 m7 m8", 2L, 2L),
      ("m2 m3 m4 m5 m6 m7 m8 m9", 2L, 2L)), s"got $got")
  }

  test("span-cut transform: covered words excised, overlaps coalesced, short docs whole") {
    val got = ExtQueries44.queries("text_span_cut")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toList
    assert(got == List(
      (1L, 8L, 0L, ""),
      (2L, 8L, 0L, ""),
      (3L, 16L, 0L, ""),
      (4L, 9L, 9L, "p q r s t u v w x"),
      (5L, 7L, 7L, "a b c d e f g"),
      (6L, 10L, 2L, "y1 y2"),
      // two overlapping repeated windows cover 9 words once, not 16
      (7L, 9L, 0L, ""),
      (8L, 9L, 0L, "")), s"got $got")
  }

  test("savings report aggregates the coalesced cut mass") {
    val got = ExtQueries44.queries("text_span_savings")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toList
    // words: 8+8+16+9+7+10+9+9 = 76; cut: 8+8+16+0+0+8+9+9 = 58
    val frac = math.rint(58.0 / 76 * 10000) / 10000
    assert(got == List((76L, 58L, frac, 6L)), s"got $got")
  }
}
