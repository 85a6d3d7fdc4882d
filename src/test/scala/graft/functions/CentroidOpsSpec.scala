package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r6: diff-tests the native nearest-centroid kernels against the composed
  * `aggregate(array(struct(lit...)))` forms they replaced (verbatim copies
  * below) — cells and PQ codes must be identical on every row, including
  * NaN-producing (zero) vectors, short vectors, and null-element vectors.
  */
class CentroidOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Verbatim pre-r6 composed argmax-cosine cell. */
  private def composedCell(v: Column, centroids: Array[(Int, Array[Double])]): Column = {
    val centArr = array(centroids.sortBy(_._1).map { case (cell, c) =>
      struct(lit(cell).as("cell"), lit(c).as("c"))
    }: _*)
    aggregate(
      centArr,
      struct(lit(Double.MinValue).as("cos"), lit(-1).as("cell")),
      (acc, s) => {
        val cs = VecOps.cosine_sim(v, s.getField("c"))
        when(cs > acc.getField("cos"),
          struct(cs.as("cos"), s.getField("cell").as("cell"))).otherwise(acc)
      }).getField("cell")
  }

  /** Verbatim pre-r6 composed per-subspace argmin-L2 code. */
  private def composedCode(sv: Column, cents: Array[Array[Double]]): Column = {
    val centArr = array(cents.zipWithIndex.map { case (c, code) =>
      struct(lit(code).as("code"), lit(c).as("c"))
    }: _*)
    aggregate(
      centArr,
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("code")),
      (acc, s) => {
        val d = VecOps.vec_l2sq(sv, s.getField("c"))
        when(d < acc.getField("d"),
          struct(d.as("d"), s.getField("code").as("code"))).otherwise(acc)
      }).getField("code")
  }

  private val rnd = new scala.util.Random(7)
  private def vec(dim: Int): Array[Double] = Array.fill(dim)(rnd.nextGaussian())

  test("nearest_cell_cos ≡ composed argmax over gaussians, zeros, dup centroids") {
    val dim = 16
    // non-contiguous cell ids (Lloyd can drop empty cells), one duplicate
    // centroid (tie → first/lowest id), one zero centroid (NaN cosine)
    val cents: Array[(Int, Array[Double])] =
      Array(0 -> vec(dim), 2 -> vec(dim), 3 -> vec(dim), 7 -> new Array[Double](dim))
    val centsWithDup = cents :+ (9 -> cents(1)._2.clone())
    val rows = (Seq.fill(300)(vec(dim)) :+ new Array[Double](dim) :+ cents(2)._2.clone())
      .map(Tuple1(_)).toDF("v").select(col("v").cast("array<double>").as("v"))
    val got = rows.select(
      CentroidOps.nearest_cell_cos(col("v"), centsWithDup).as("k"),
      composedCell(col("v"), centsWithDup).as("c"))
    assert(got.filter(col("k") =!= col("c")).count() === 0)
    // NB: the zero centroid's NaN cosine WINS under SQL NaN-max comparison
    // semantics (both forms agree — that is the point of the diff test);
    // sanity-check argmax behavior on a clean centroid set instead:
    val clean = cents.take(3)
    val got2 = rows.select(
      CentroidOps.nearest_cell_cos(col("v"), clean).as("k"),
      composedCell(col("v"), clean).as("c"))
    assert(got2.filter(col("k") =!= col("c")).count() === 0)
    // the planted exact-centroid row (cents(2) = cell id 3) lands home
    assert(got2.filter(col("k") === 3).count() >= 1)
  }

  test("pq_encode ≡ composed per-subspace argmin (incl. short vector)") {
    val m = 4; val dsub = 4; val ksub = 8
    val cb: Array[Array[Array[Double]]] =
      Array.tabulate(m)(_ => Array.fill(ksub)(vec(dsub)))
    val rows = (Seq.fill(300)(vec(m * dsub)) :+ vec(m * dsub - 3) // short
      :+ new Array[Double](m * dsub)) // zero vector
      .map(Tuple1(_)).toDF("v").select(col("v").cast("array<double>").as("v"))
    val composed = array((0 until m).map(j =>
      composedCode(slice(col("v"), j * dsub + 1, dsub), cb(j))): _*)
    val got = rows.select(
      CentroidOps.pq_encode(col("v"), cb, dsub).as("k"),
      composed.as("c"))
    assert(got.filter(not(col("k") <=> col("c"))).count() === 0)
  }

  test("interpreted (non-codegen) eval path agrees with codegen") {
    val dim = 8
    val cents: Array[(Int, Array[Double])] = Array(0 -> vec(dim), 1 -> vec(dim))
    val v = vec(dim)
    val expr = CentroidOps.NearestCellCos(
      org.apache.spark.sql.catalyst.expressions.Literal.create(v,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      cents.map(_._1), cents.map(_._2))
    val interpreted = expr.eval(null)
    val viaDf = Seq(Tuple1(v)).toDF("v")
      .select(CentroidOps.nearest_cell_cos(col("v").cast("array<double>"), cents))
      .head().getInt(0)
    assert(interpreted === viaDf)
  }
}
