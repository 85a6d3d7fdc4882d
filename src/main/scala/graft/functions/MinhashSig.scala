package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a shingle-hash array, as a native Catalyst
  * expression: element j = min over shingles h of xxhash64(j, h).
  *
  * For NON-EMPTY input arrays this is BIT-EXACT with the composed-functions
  * formulation `array((0 until p).map(j => array_min(transform(shingles,
  * h => xxhash64(lit(j), h)))))` — per-perm seed = XXH64.hashInt(j, 42)
  * (the int literal hashes first), then XXH64.hashLong(h, seed) per
  * shingle — but in ONE traversal of the shingle array with zero
  * intermediate arrays, where the composed form allocates p transformed
  * copies of the array per row and re-walks it p times. On the hottest
  * dedup projection (p = 32 over ~40-word-shingle documents) that is the
  * difference between 1 and 65 array materializations per row.
  *
  * Edge contract (deliberately NOT the composed form's, which degrades to
  * null elements there; pinned by PropertySpec):
  *  - empty array → [Long.MaxValue × p] (the identity of min — no shingles
  *    means nothing beats the fold's start value), where the composed form
  *    yields p nulls (`array_min([]) = null`). Unreachable via
  *    [[graft.dedup.Dedup.wordShingleHashes]], which is empty-safe, but
  *    pinned for any other caller;
  *  - NULL array → NULL (nullIntolerant), vs the composed form's non-null
  *    array of p nulls;
  *  - a null shingle ELEMENT contributes the bare per-perm seed, exactly
  *    as `xxhash64(lit(j), null)` does (hash functions skip null children);
  *  - dataType is array<bigint> with containsNull = false — this
  *    expression never produces null elements.
  */
object MinhashSig {

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def seedsFor(p: Int): Array[Long] =
    seedCache.computeIfAbsent(p,
      _ => Array.tabulate(p)(j => XXH64.hashInt(j, GraftHash.SparkSeed)))

  /** Static helper: called from generated code. */
  def minhashSig(shingles: ArrayData, numPerms: Int): ArrayData = {
    val seeds = seedsFor(numPerms)
    val out = new Array[Long](numPerms)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i)) {
        var k = 0
        while (k < numPerms) {
          if (seeds(k) < out(k)) out(k) = seeds(k)
          k += 1
        }
      } else {
        val h = shingles.getLong(i)
        var k = 0
        while (k < numPerms) {
          val v = XXH64.hashLong(h, seeds(k))
          if (v < out(k)) out(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  case class MinhashSignature(child: Expression, numPerms: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() = {
      child.dataType match {
        case ArrayType(LongType, _) if numPerms > 0 =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_signature needs array<bigint> and numPerms > 0, got $other / $numPerms")
      }
    }
    override protected def nullSafeEval(v: Any): Any =
      minhashSig(v.asInstanceOf[ArrayData], numPerms)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.MinhashSig.minhashSig($c, $numPerms)")
    override protected def withNewChildInternal(c: Expression): MinhashSignature =
      copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  def minhash_signature(shingles: Column, numPerms: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(shingles), numPerms))
}
