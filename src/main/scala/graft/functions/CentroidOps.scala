package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid kernels as native codegen expressions (guide §1.2
  * step 2): the composed forms — `aggregate(array(struct(lit(cell),
  * lit(centroid)), ...), ...)` with a [[VecOps]] distance per element —
  * embed the WHOLE codebook as nested literals in the plan. At PQ sizes
  * (m=16 × ksub=32 × dsub=4 doubles) that is a ~2k-literal expression tree
  * per projection, paid at ANALYSIS/codegen time on the driver for every
  * Lloyd iteration (the codebook literals change each round, so nothing
  * caches) and re-walked through HOF plumbing per row. These kernels ship
  * the codebook as a referenced object instead: the plan is one node, the
  * generated code is iteration-invariant (codegen cache hits across Lloyd
  * rounds), and the per-row loop is allocation-free.
  *
  * BIT-identical to the composed forms on every non-null vector
  * (CentroidOpsSpec diff-tests both):
  *  - same per-element arithmetic ([[VecOps.cosineOrNull]] /
  *    [[VecOps.l2sqOrNull]] ascending folds), same scan order, strict
  *    comparison keeping the FIRST optimum;
  *  - comparisons use Spark SQL double semantics (NaN greater than
  *    everything — `nanSafeCompareDoubles` — exactly what the composed
  *    `when(d < acc.d)` generates), so a NaN distance behaves identically;
  *  - a short vector / null ELEMENT makes the per-centroid distance the
  *    [[VecOps]] null sentinel, which leaves the accumulator untouched —
  *    reproducing the composed fold-through-null result of −1.
  *
  * Sole divergence: a NULL input VECTOR yields SQL NULL here (standard
  * nullIntolerant) where the composed fold yielded its init value −1. No
  * caller can hit it — every call site casts a non-null parquet embedding
  * column — and CentroidOpsSpec pins the live-data equivalence.
  */
object CentroidOps {

  /** nanSafeCompareDoubles(x, y) > 0 — Spark's `>` on doubles. */
  @inline private def gtSql(x: Double, y: Double): Boolean =
    x > y || (x.isNaN && !y.isNaN)

  /** nanSafeCompareDoubles(x, y) < 0 — Spark's `<` on doubles. */
  @inline private def ltSql(x: Double, y: Double): Boolean =
    x < y || (y.isNaN && !x.isNaN)

  private final val NullD = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)

  /** Static helper (called from generated code): argmax-cosine cell id
    * over (cells(i), cents(i)), first maximum wins.
    */
  def nearestCellCos(v: ArrayData, cells: Array[Int],
      cents: Array[Array[Double]]): Int = {
    var best = Double.MinValue
    var cell = -1
    var i = 0
    while (i < cents.length) {
      val cs = cosTo(v, cents(i))
      if (!VecOps.isNullSentinel(cs) && gtSql(cs, best)) { best = cs; cell = cells(i) }
      i += 1
    }
    cell
  }

  /** [[VecOps.cosineOrNull]] against a plain double[] right side (a literal
    * array holds the same doubles; fold order identical).
    */
  private def cosTo(a: ArrayData, b: Array[Double]): Double = {
    val n = a.numElements()
    if (n != b.length) return NullD
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return NullD
      val x = a.getDouble(i); val y = b(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / math.sqrt(na * nb)
  }

  /** Static helper (called from generated code): PQ codes — per subspace
    * j, argmin-L2 code of v[j·dsub, (j+1)·dsub) over codebook(j), −1 when
    * the slice is short or null-tainted (the composed form's
    * fold-through-null result).
    */
  def pqCodes(v: ArrayData, codebook: Array[Array[Array[Double]]],
      dsub: Int): ArrayData = {
    val m = codebook.length
    val out = new Array[Int](m)
    val n = v.numElements()
    var j = 0
    while (j < m) {
      val off = j * dsub
      var code = -1
      if (off + dsub <= n) {
        var nullTainted = false
        var i = off
        while (i < off + dsub && !nullTainted) {
          if (v.isNullAt(i)) nullTainted = true
          i += 1
        }
        if (!nullTainted) {
          val cents = codebook(j)
          var best = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            val cent = cents(c)
            var d = 0.0
            var t = 0
            while (t < dsub) {
              val x = v.getDouble(off + t) - cent(t)
              d += x * x
              t += 1
            }
            if (ltSql(d, best)) { best = d; code = c }
            c += 1
          }
        }
      }
      out(j) = code
      j += 1
    }
    new GenericArrayData(out)
  }

  case class NearestCellCos(child: Expression, cells: Array[Int],
      cents: Array[Array[Double]]) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() = child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell_cos needs array<double>, got $other")
    }
    override protected def nullSafeEval(v: Any): Any =
      nearestCellCos(v.asInstanceOf[ArrayData], cells, cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.CentroidOps.nearestCellCos($c, $cellsRef, $centsRef)")
    }
    override protected def withNewChildInternal(c: Expression): NearestCellCos =
      copy(child = c)
    override def prettyName: String = "nearest_cell_cos"
  }

  case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]],
      dsub: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() = child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<double>, got $other")
    }
    override protected def nullSafeEval(v: Any): Any =
      pqCodes(v.asInstanceOf[ArrayData], codebook, dsub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("codebook", codebook, "double[][][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.CentroidOps.pqCodes($c, $cbRef, $dsub)")
    }
    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
    override def prettyName: String = "pq_encode"
  }

  def nearest_cell_cos(v: Column, centroids: Array[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    Bridge.column(NearestCellCos(Bridge.expression(v),
      sorted.map(_._1), sorted.map(_._2)))
  }

  def pq_encode(v: Column, codebook: Array[Array[Array[Double]]], dsub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(v), codebook, dsub))
}
