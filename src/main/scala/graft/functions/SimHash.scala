package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array, as a native Catalyst expression.
  *
  * SimHash(doc) = sign-vector of the per-bit sum of each token's hash:
  * bit i of the result is 1 iff Σ_tokens (bit i of hash ? +1 : −1) > 0.
  * Near-duplicate docs land within small Hamming distance; pairing is then a
  * cheap band-bucket join (see graft.dedup.Dedup.simhashNearDups).
  *
  * The token hash is [[TokenHash]] (codepoint FNV-1a 64 + murmur finalizer)
  * rather than xxhash64-over-bytes: bit-identical to what plain SQL modular
  * arithmetic can compute, which is what lets `q_simhash_neardups` carry a
  * full DuckDB oracle (signature build, banding, AND Hamming verify replay
  * externally).
  *
  * Implemented as an Expression (not a UDF) so the 64·n inner loop runs on
  * UTF8String bytes with no catalyst→Scala conversion, and `doGenCode` keeps
  * the surrounding stage in whole-stage codegen via a single static call.
  */
object SimHash {

  /** Static helper: called from generated code. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = TokenHash.hash(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() = {
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"simhash64 needs array<string>, got $other")
      }
    }
    override protected def nullSafeEval(v: Any): Any =
      simhash64(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  def simhash64(tokens: Column): Column = Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Hamming distance between two 64-bit hashes as a Column expr. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
