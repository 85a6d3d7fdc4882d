package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Set-intersection size over two SORTED-DISTINCT arrays as one merge scan —
  * the verify kernel of the pairwise dedup operators (guide §1.2 "per-task
  * work", §4.1 "prefer built-ins/expressions").
  *
  * `array_intersect(a, b)` builds a hash set of one side and materializes the
  * intersection array per ROW-PAIR; in a blocked pairwise join that is two
  * `OpenHashSet` builds + an output array per candidate pair, only to take
  * `size(...)` of it. When both inputs are sorted and distinct (one
  * `sort_array(array_distinct(...))` per DOCUMENT, amortized over all its
  * pairs), the same count is a zero-allocation two-pointer merge:
  *
  *   |A ∩ B|  — and with distinct inputs |A ∪ B| = |A| + |B| − |A ∩ B|,
  *
  * so Jaccard needs no `array_union` either. Bit-identical jaccard: the same
  * integer counts feed the same double division.
  *
  * Element types: BIGINT (shingle hashes) and STRING (tokens; UTF8String
  * binary order — exactly `sort_array`'s order). Null elements compare equal
  * to each other and sort FIRST (`sort_array` default), matching
  * `array_intersect`'s null-matches-null semantics.
  */
object ArraySetOps {

  /** Static helper: called from generated code (long elements). */
  def longIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    // nulls sort first in sort_array: consume the (at most one per side,
    // distinct input) leading nulls, counting a match when both have one
    if (i < na && a.isNullAt(i)) {
      if (j < nb && b.isNullAt(j)) { n += 1; j += 1 }
      i += 1
    } else if (j < nb && b.isNullAt(j)) j += 1
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  /** Static helper: called from generated code (string elements). */
  def utf8IntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    if (i < na && a.isNullAt(i)) {
      if (j < nb && b.isNullAt(j)) { n += 1; j += 1 }
      i += 1
    } else if (j < nb && b.isNullAt(j)) j += 1
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    private lazy val elemType: DataType = left.dataType match {
      case ArrayType(et, _) => et
      case _ => null
    }
    override def checkInputDataTypes() = {
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) |
             (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sorted_intersect_count needs two array<bigint> or two array<string>, got $other")
      }
    }
    private def helper: String = elemType match {
      case LongType => "longIntersectCount"
      case _ => "utf8IntersectCount"
    }
    override protected def nullSafeEval(a: Any, b: Any): Any = elemType match {
      case LongType =>
        longIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case _ =>
        utf8IntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.ArraySetOps.$helper($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression)
        : SortedIntersectCount = copy(left = l, right = r)
    override def prettyName: String = "sorted_intersect_count"
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
