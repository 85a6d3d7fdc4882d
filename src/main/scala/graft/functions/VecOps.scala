package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense-vector kernels as native codegen expressions (guide §1.2 step 2 /
  * §4.1): the composed form `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * materializes a product ARRAY per evaluation and folds it through
  * higher-order-function plumbing; at 2M candidate pairs × 64 dims (the
  * exact embedding near-dup twin) that is essentially the whole query cost.
  * These run the same left-to-right summation over the same doubles —
  * BIT-identical results (VecOpsSpec pins equality against the composed
  * form) — in one allocation-free loop.
  *
  * Null semantics mirror the composed form exactly: NULL array → NULL
  * (nullIntolerant); any NULL element → NULL (a null product nulls the
  * fold); length mismatch → NULL (zip_with pads with nulls).
  */
object VecOps {

  /** SQL-NULL marker: a NON-canonical NaN bit pattern. Every arithmetic NaN
    * the kernels can produce is hardware-canonicalized (0x7ff8…000), so the
    * sentinel can never collide with a genuine result (e.g. the 0/0 cosine
    * of two empty arrays stays a real, canonical NaN).
    */
  private final val NullBits = 0x7ff8000000000001L

  def isNullSentinel(v: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(v) == NullBits

  private final val NullSentinel = java.lang.Double.longBitsToDouble(NullBits)

  /** Σ a(i)·b(i), ascending — or the null sentinel. Called from codegen. */
  def dotOrNull(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return NullSentinel
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return NullSentinel
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** dot/√(‖a‖²·‖b‖²) with each accumulator summed ascending — bit-identical
    * to three separate ascending folds. Called from codegen.
    */
  def cosineOrNull(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return NullSentinel
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return NullSentinel
      val x = a.getDouble(i); val y = b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / math.sqrt(na * nb)
  }

  /** Σ (a(i)−b(i))², ascending — or the null sentinel. Called from codegen. */
  def l2sqOrNull(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return NullSentinel
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return NullSentinel
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  abstract class VecBinary extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs two array<double>, got $other")
      }
    protected def helper: String // static kernel name on VecOps
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val ad = a.asInstanceOf[ArrayData]; val bd = b.asInstanceOf[ArrayData]
      val v = helper match {
        case "dotOrNull" => dotOrNull(ad, bd)
        case "l2sqOrNull" => l2sqOrNull(ad, bd)
        case _ => cosineOrNull(ad, bd)
      }
      if (isNullSentinel(v)) null else v
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("vecOut")
        s"""
           |double $tmp = graft.functions.VecOps.$helper($a, $b);
           |if (graft.functions.VecOps.isNullSentinel($tmp)) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $tmp;
           |}
         """.stripMargin
      })
  }

  case class VecDot(left: Expression, right: Expression) extends VecBinary {
    override protected def helper: String = "dotOrNull"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  case class CosineSim(left: Expression, right: Expression) extends VecBinary {
    override protected def helper: String = "cosineOrNull"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_sim"
  }

  case class L2Sq(left: Expression, right: Expression) extends VecBinary {
    override protected def helper: String = "l2sqOrNull"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
      copy(left = l, right = r)
    override def prettyName: String = "vec_l2sq"
  }

  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  def vec_l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Sq(Bridge.expression(a), Bridge.expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
