package graft.functions

import graft.SparkTestBase
import graft.functions.VecOps.{cosine_sim, vec_dot, vec_l2sq}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** r6 pins: the native vector kernels must be BIT-identical to the composed
  * `aggregate(zip_with(...))` forms they replaced (same ascending folds), and
  * must reproduce their null semantics exactly — `Dedup.cosine` feeds oracled
  * outputs (q_embed_refcos, q_embed_neardups*, q_ann_*), so any drift is a
  * correctness regression, not a perf detail.
  */
class VecOpsSpec extends AnyFunSpec with Matchers {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def composedDot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
  private def composedCos(a: Column, b: Column): Column =
    composedDot(a, b) / sqrt(composedDot(a, a) * composedDot(b, b))
  private def composedL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private def randRows(n: Int, dim: Int, seed: Int): Seq[(Seq[Double], Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      (Seq.fill(dim)(rnd.nextDouble() * 4 - 2), Seq.fill(dim)(rnd.nextDouble() * 4 - 2))
    }
  }

  private def assertBitEqual(df: org.apache.spark.sql.DataFrame): Unit =
    df.collect().foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) { r.isNullAt(0) shouldBe r.isNullAt(1) }
      else java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }

  it("vec_dot / cosine_sim / vec_l2sq are bit-identical to the composed forms") {
    val df = randRows(300, 64, 3).toDF("a", "b")
    assertBitEqual(df.select(vec_dot(col("a"), col("b")), composedDot(col("a"), col("b"))))
    assertBitEqual(df.select(cosine_sim(col("a"), col("b")), composedCos(col("a"), col("b"))))
    assertBitEqual(df.select(vec_l2sq(col("a"), col("b")), composedL2(col("a"), col("b"))))
  }

  it("ragged dims and empty arrays match the composed form (null / NaN)") {
    val rows = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch → null
      (Seq.empty[Double], Seq.empty[Double]), // dot/l2sq 0.0
      (Seq(0.0, 0.0), Seq(1.0, 2.0))) // zero norm
    val df = rows.toDF("a", "b")
    assertBitEqual(df.select(vec_dot(col("a"), col("b")), composedDot(col("a"), col("b"))))
    assertBitEqual(df.select(vec_l2sq(col("a"), col("b")), composedL2(col("a"), col("b"))))
    // cosine: only the length-mismatch row is comparable — under ANSI mode
    // the COMPOSED form throws DIVIDE_BY_ZERO on a zero-norm side, so no
    // such row can exist in any input the r5 queries ran green on. The
    // native kernel is strictly more defined there (IEEE NaN); pinned below.
    assertBitEqual(df.limit(1).select(
      cosine_sim(col("a"), col("b")), composedCos(col("a"), col("b"))))
    val zeroNorm = df.select(cosine_sim(col("a"), col("b")).as("c")).collect()
    zeroNorm(1).isNullAt(0) shouldBe false
    assert(zeroNorm(1).getDouble(0).isNaN, "empty arrays → NaN cosine")
    assert(zeroNorm(2).getDouble(0).isNaN, "zero norm → NaN cosine")
    intercept[Exception] { // documents WHY the composed row is not comparable
      df.select(composedCos(col("a"), col("b"))).collect()
    }
  }

  it("null elements null the result, exactly as the composed fold does") {
    val df = Seq(1).toDF("x").select(
      array(lit(1.0), lit(null).cast("double"), lit(3.0)).as("a"),
      array(lit(1.0), lit(2.0), lit(3.0)).as("b"))
    assertBitEqual(df.select(vec_dot(col("a"), col("b")), composedDot(col("a"), col("b"))))
    assertBitEqual(df.select(cosine_sim(col("a"), col("b")), composedCos(col("a"), col("b"))))
    assertBitEqual(df.select(vec_l2sq(col("a"), col("b")), composedL2(col("a"), col("b"))))
    df.select(vec_dot(col("a"), col("b"))).head().isNullAt(0) shouldBe true
  }

  it("NULL array input → NULL result (nullIntolerant, like the composed form)") {
    val df = Seq(1).toDF("x").select(
      lit(null).cast("array<double>").as("a"), array(lit(1.0)).as("b"))
    df.select(vec_dot(col("a"), col("b"))).head().isNullAt(0) shouldBe true
    df.select(cosine_sim(col("a"), col("b"))).head().isNullAt(0) shouldBe true
  }

  it("interpreted path (eval) agrees with codegen on the same inputs") {
    // force interpreted evaluation through a literal-only projection the
    // optimizer constant-folds via eval()
    val a = Array(1.5, -2.25, 3.0); val b = Array(0.5, 4.0, -1.0)
    val viaEval = VecOps.dotOrNull(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(b))
    val viaDf = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(vec_dot(col("a"), col("b"))).head().getDouble(0)
    viaEval shouldBe viaDf
  }
}
