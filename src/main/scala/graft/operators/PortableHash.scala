package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable hashing primitives.
 *
 * Every hash here is defined so the *identical* value is computable in
 * ANSI-ish SQL (the DuckDB oracle): the base hash H(s) is the first 15 hex
 * digits of md5(s) parsed as a base-16 integer (60 bits, always fits a
 * signed 64-bit long, never negative), and all derived hash families are
 * integer arithmetic mod a 31-bit prime, so no overflow and no
 * floating-point divergence on either engine.
 *
 * Scale note: md5 is ~2x slower than murmur3 but is the only hash both
 * engines share bit-for-bit; swap `h` for `hash()` (murmur3) in production
 * where cross-engine verification isn't needed.
 */
object PortableHash {

  /** 31-bit Mersenne prime modulus for all derived hash families. */
  val P: Long = 2147483647L

  // 2 bands x 8 rows: band-collision probability jac^8 — 0.43 at jac=0.9,
  // 0.17 at 0.8, <1e-4 at 0.3 — so candidate sets stay near the true
  // near-dup set even on pathologically similar corpora (small vocab =>
  // most doc pairs share most words; 4x4 banding collided on ~half of all
  // pairs and the candidate join went quadratic).
  val NumHashes = 16 // minhash signature length
  val NumBands = 2
  val BandRows: Int = NumHashes / NumBands

  val SimHashBits = 60 // simhash fingerprint width (fits the 60-bit base hash)
  val SimHashChunks = 4 // banded hamming join: 15 bits per chunk
  val ChunkBits: Int = SimHashBits / SimHashChunks

  /** Minhash affine coefficients, fixed + shared with the SQL mirror. */
  val A: Array[Long] = Array.tabulate(NumHashes)(j => (961748927L * (j + 1) + 104729L) % P)
  val B: Array[Long] = Array.tabulate(NumHashes)(j => (885570437L * (j + 1) + 12345L) % P)

  /** Base hash H(s): first 15 hex digits of md5 as a long (60 bits, >= 0). */
  def h(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** JVM-side mirror of `h` for per-row use inside mapGroups/mapPartitions
    * operators — bit-identical to the Column and SQL forms. The first 15 hex
    * digits of md5 are bytes 0..6 plus the high nibble of byte 7. Pass a
    * reused MessageDigest (create one per group/partition, not per row). */
  def hJvm(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** H(s) mod P — the input to every derived hash family. */
  def hMod(c: Column): Column = h(c) % P

  /** j-th minhash family member applied to an hMod column. */
  def minhash(j: Int, hm: Column): Column = (lit(A(j)) * hm + lit(B(j))) % P

  // ------------------------------------------------------------------
  // SQL mirrors (DuckDB dialect) — same values, generated from the same
  // constants so the two implementations cannot drift.
  // ------------------------------------------------------------------

  def hSql(e: String): String = s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"
  def hModSql(e: String): String = s"(${hSql(e)} % $P)"
  def minhashSql(j: Int, hmE: String): String = s"((${A(j)} * $hmE + ${B(j)}) % $P)"
}
