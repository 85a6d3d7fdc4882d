package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Codepoint-level FNV-1a 64 with a murmur3-style 64-bit finalizer — the
  * token hash feeding [[SimHash]]. Chosen over Spark's xxhash64 because the
  * whole chain is replayable in plain SQL 64-bit modular arithmetic (the
  * DuckDB oracle for `q_simhash_neardups` reproduces it bit-exactly), while
  * the finalizer keeps per-bit dispersion good enough for SimHash's 64
  * per-bit votes. Defined over UNICODE CODEPOINTS — not UTF-8 bytes — so an
  * external engine's character indexing produces identical hash inputs for
  * non-ASCII text. All constants are the classic public FNV-1a / murmur3
  * values.
  */
object TokenHash {
  val FnvOffset = 0xcbf29ce484222325L
  val FnvPrime = 0x100000001b3L
  private val Mix1 = 0xff51afd7ed558ccdL
  private val Mix2 = 0xc4ceb9fe1a85ec53L

  /** murmur3's 64-bit finalizer (avalanche mix). */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= Mix1
    h ^= h >>> 33; h *= Mix2
    h ^ (h >>> 33)
  }

  /** FNV-1a over the string's codepoints, finalized with [[fmix64]].
    * Decodes UTF-8 in place — no String allocation on the hot path.
    */
  def hash(s: UTF8String): Long = {
    var h = FnvOffset
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0) {
        cp = ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0) {
        cp = ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
          (s.getByte(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
          ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f); i += 4
      }
      h = (h ^ cp) * FnvPrime
    }
    fmix64(h)
  }

  /** JVM-String twin of [[hash]] (driver-side fixtures and tests). */
  def hash(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h ^ cp) * FnvPrime
      i += Character.charCount(cp)
    }
    fmix64(h)
  }
}
