package graft.functions

import graft.SparkTestBase
import graft.functions.ArraySetOps.sorted_intersect_count
import org.apache.spark.sql.functions.{size => asize, _}
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** r6 pins for the sorted-merge intersect kernel: on sorted-distinct inputs
  * it must equal `asize(array_intersect(a, b))` exactly — that identity is
  * what makes the rewritten token-jaccard / minhash verifies bit-identical.
  */
class ArraySetOpsSpec extends AnyFunSpec with Matchers {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def check[T](rows: Seq[(Seq[T], Seq[T])])(toDf: Seq[(Seq[T], Seq[T])] =>
      org.apache.spark.sql.DataFrame): Unit = {
    val df = toDf(rows)
      .select(
        sorted_intersect_count(
          sort_array(array_distinct(col("a"))),
          sort_array(array_distinct(col("b")))).as("fast"),
        asize(array_intersect(array_distinct(col("a")), array_distinct(col("b")))).as("ref"))
    df.collect().foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  it("long arrays: equals asize(array_intersect) incl. empty and disjoint") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong)
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong)
      (a, b)
    } ++ Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    check(rows)(_.toDF("a", "b"))
  }

  it("string arrays: equals asize(array_intersect) on UTF8 binary order") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "ab", "Ab", "zz", "ß", "日本", "x1", "", " ", "€")
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      (a, b)
    }
    check(rows)(_.toDF("a", "b"))
  }

  it("null elements: null matches null, as array_intersect does") {
    val df = Seq(1).toDF("x").select(
      sorted_intersect_count(
        sort_array(array(lit(null).cast("long"), lit(3L))),
        sort_array(array(lit(null).cast("long"), lit(4L)))).as("fast"),
      asize(array_intersect(
        array(lit(null).cast("long"), lit(3L)),
        array(lit(null).cast("long"), lit(4L)))).as("ref"))
    val r = df.head()
    r.getInt(0) shouldBe 1
    r.getInt(0) shouldBe r.getInt(1)
  }

  it("jaccard identity: inter/(n1+n2-inter) == inter/asize(array_union)") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { _ =>
      (Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong),
        Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(60).toLong))
    }
    val df = rows.toDF("a", "b")
      .select(array_distinct(col("a")).as("da"), array_distinct(col("b")).as("db"))
      .select(
        (sorted_intersect_count(sort_array(col("da")), sort_array(col("db"))).cast("double") /
          (asize(col("da")) + asize(col("db")) -
            sorted_intersect_count(sort_array(col("da")), sort_array(col("db"))).cast("double")))
          .as("fast"),
        (asize(array_intersect(col("da"), col("db"))).cast("double") /
          asize(array_union(col("da"), col("db")))).as("ref"))
    df.collect().foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }
}
