package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (the classic MOSS scheme: k-gram hashes →
  * per-sliding-window minimum → distinct) as ONE native codegen expression.
  *
  * Three deliberate choices:
  *  - the k-gram hash is a POLYNOMIAL rolling hash over codepoints
  *    (base B = 1000003, modulus M = 2147483629, both < 2^31): every
  *    multiplication fits a 64-bit long, and — the point — the whole scheme
  *    replays in plain BIGINT SQL, so `q_fingerprint` has a DuckDB oracle
  *    (the r3 xxhash64-substring form was un-oracleable);
  *  - it ROLLS: one add/remove per position, O(n) per document, where the
  *    composed-column form (`transform(sequence, i => xxhash64(substr))`)
  *    re-hashed every k-char substring, O(n·k) with n string allocations;
  *  - window minima use a monotone deque, O(n) total, not an O(n·w) re-scan
  *    per window.
  *
  * Semantics (pinned by TextAnalysisSpec + the oracle): texts shorter than
  * k fingerprint as the single hash of the whole text (empty text → [0]);
  * gram counts ≤ w yield one global minimum; output is the
  * first-occurrence-distinct minima sequence.
  */
object Winnow {
  val B = 1000003L
  val M = 2147483629L

  /** Static helper: called from generated code. */
  def fingerprint(s: UTF8String, k: Int, w: Int): ArrayData = {
    // decode codepoints once
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var i = 0; var ci = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    if (n < k) {
      var h = 0L
      var j = 0
      while (j < n) { h = (h * B + cps(j)) % M; j += 1 }
      return new GenericArrayData(Array(h))
    }
    // rolling k-gram hashes
    val nG = n - k + 1
    val grams = new Array[Long](nG)
    var powK1 = 1L
    var p = 0
    while (p < k - 1) { powK1 = (powK1 * B) % M; p += 1 }
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + cps(j)) % M; j += 1 }
    grams(0) = h
    var g = 1
    while (g < nG) {
      val t = (h - (cps(g - 1) * powK1) % M + M) % M
      h = (t * B + cps(g + k - 1)) % M
      grams(g) = h
      g += 1
    }
    // sliding-window minima via monotone (ascending) deque of indices
    val nW = if (nG <= w) 1 else nG - w + 1
    val winW = if (nG <= w) nG else w
    val mins = new Array[Long](nW)
    val deque = new Array[Int](nG)
    var head = 0; var tail = 0 // [head, tail)
    var x = 0
    while (x < nG) {
      while (tail > head && grams(deque(tail - 1)) >= grams(x)) tail -= 1
      deque(tail) = x; tail += 1
      if (deque(head) <= x - winW) head += 1
      if (x >= winW - 1) mins(x - winW + 1) = grams(deque(head))
      x += 1
    }
    // first-occurrence distinct
    val seen = new java.util.HashSet[Long]()
    val out = new Array[Long](mins.length)
    var o = 0
    var m = 0
    while (m < mins.length) {
      if (seen.add(mins(m))) { out(o) = mins(m); o += 1 }
      m += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }

  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() = {
      child.dataType match {
        case StringType if k > 0 && w > 0 =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"winnow_fingerprint needs a string and k, w > 0; got $other / $k / $w")
      }
    }
    override protected def nullSafeEval(v: Any): Any =
      fingerprint(v.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.fingerprint($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
      copy(child = c)
    override def prettyName: String = "winnow_fingerprint"
  }

  def winnow_fingerprint(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(text), k, w))
}
