package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Pinned golden hashes for the ONE query the driver's correctness gate
 * records as `no_oracle`: `ann_topk_ivf` — IVF centroids come from an
 * iterative float k-means, and float summation order is engine-specific,
 * so no exact cross-engine replay exists. (r13 graduated everything
 * else: `cooc_sampled_llr` via the portable hash draw, `bpe_merges` /
 * `bpe_tokenize` via a recursive-CTE replay of the integer merge loop —
 * all driver-oracled now, pins retired.) Each pinned query already has
 * semantic specs (recall bounds, reference-loop equality, property tests);
 * this spec adds CROSS-ROUND drift detection: the exact output bytes at
 * sf0.001, sf0.01 and sf0.1 (the bench scale factor — drift that only
 * manifests at bench scale must not be invisible to `sbt test`) are
 * canonicalized the same way the driver's oracle
 * compare does (columns sorted by name, values rendered to strings, rows
 * sorted) and hashed; a code change that shifts any value fails here
 * loudly instead of silently passing the rows-only gate.
 *
 * Provenance: hashes were produced by this spec's own regen mode
 * (`GRAFT_PIN_REGEN=1 sbt "testOnly graft.GoldenHashSpec"` prints the
 * current pins) against the driver-generated testdata of 2026-08-14
 * (round 8), after the semantic suites (BpeSpec, SamplingSpec, the
 * ExtOperatorsSpec recall tests) were green — i.e. each pin snapshots
 * an output the semantic specs had independently validated.
 *
 * The driver regenerates /root/testdata each round (deterministic seed,
 * but the generator itself has changed across rounds — r7 changed the
 * events `ts` encoding and the documents vocabulary). A regenerated
 * input would shift these hashes with NO code drift, so each pin also
 * records a fingerprint of the exact input file: on fingerprint mismatch
 * the test CANCELS with a re-pin instruction (visible in the run report)
 * rather than failing spuriously; on fingerprint match, hash mismatch is
 * a hard failure.
 */
class GoldenHashSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def sha256(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Fingerprint of the input parquet file the query reads. */
  private def fileFp(sfDir: String, table: String): String =
    sha256(Files.readAllBytes(Paths.get(s"$sfDir/$table.parquet"))).take(16)

  /** Driver-compare canonicalization: columns sorted by name, values as
    * strings (null sentinel distinct from "null"), rows sorted. */
  private def canonicalHash(df: DataFrame): String = {
    val cols = df.columns.sorted.toIndexedSeq
    val rendered = df
      .select(cols.map(c => col(c).cast("string")): _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString).mkString("\u0001"))
      .sorted
      .mkString("\n")
    sha256(rendered.getBytes("UTF-8"))
  }

  private val regen = sys.env.contains("GRAFT_PIN_REGEN")

  /** name -> (input table, sfDir -> (pinned input fp, pinned output hash)).
    * sf0.1 is pinned too: it is the BENCH scale factor, and drift that only
    * manifests at bench scale (e.g. a sampling path that only activates
    * above a row-count threshold) would be invisible to the small-SF pins. */
  private case class Pin(query: String, table: String,
      sf0001: (String, String), sf001: (String, String), sf01: (String, String))

  // format: (input-file sha256 prefix, canonical output sha256)
  private val pins = Seq(
    Pin("ann_topk_ivf", "embeddings",
      sf0001 = ("a3177c59491c14cc",
        "fed7b9aca1e84c9ea3e84929f9778aba55f47637614c471373a783832550e344"),
      sf001 = ("5bd2b0f09265a066",
        "a92407f4d8fe89e4a272d8348407c146b68987389362a4c690ad231ea319b63d"),
      sf01 = ("f5a6fe8c86ce8719",
        "1f91327296d482f5cc0f135e8252104fade561ee5b4a627f6f1fe469f5cc707c"))
  )

  private def check(p: Pin, sfDir: String, pinned: (String, String)): Unit = {
    val (pinFp, pinHash) = pinned
    val fp = fileFp(sfDir, p.table)
    val hash = canonicalHash(SparkEntry.queries(p.query)(spark, sfDir))
    if (regen) {
      info(s"""PIN ${p.query} $sfDir -> ("$fp", "$hash")""")
    } else if (fp != pinFp) {
      cancel(s"${p.query}: input ${p.table}.parquet at $sfDir was regenerated " +
        s"(fingerprint $fp, pinned $pinFp) — re-pin via " +
        s"GRAFT_PIN_REGEN=1 sbt 'testOnly graft.GoldenHashSpec' AFTER the " +
        "semantic suites (BpeSpec, SamplingSpec, recall specs) are green")
    } else {
      assert(hash == pinHash,
        s"${p.query} drifted at $sfDir: canonical output hash $hash != pinned " +
          s"$pinHash with IDENTICAL input — a code change altered the output " +
          "of a no_oracle query; diff against the semantic specs before re-pinning")
    }
  }

  pins.foreach { p =>
    test(s"${p.query} @ sf0.001 matches pinned golden hash") {
      check(p, "/root/testdata/sf0.001", p.sf0001)
    }
    test(s"${p.query} @ sf0.01 matches pinned golden hash") {
      check(p, "/root/testdata/sf0.01", p.sf001)
    }
    test(s"${p.query} @ sf0.1 (bench scale) matches pinned golden hash") {
      check(p, "/root/testdata/sf0.1", p.sf01)
    }
  }
}
