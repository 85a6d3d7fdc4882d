package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the within-document repetition metrics against hand-computed values
  * on crafted line sets and token streams.
  */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def metrics(lines: Seq[String]): (Double, Double) =
    Seq(Tuple1(lines)).toDF("lines").select(
      Repetition.dupLineFrac(col("lines")),
      Repetition.dupCharFrac(col("lines")))
      .as[(Double, Double)].collect().head

  test("dup line/char fractions on crafted lines") {
    // "aa" repeats (2 of 4 lines dup; 4 of 10 chars in duplicated lines)
    val (lf, cf) = metrics(Seq("aa", "bbb", "aa", "ccc"))
    assert(lf === 0.25) // 4 lines, 3 distinct
    assert(cf === 0.4)  // chars: 2+3+2+3 = 10, dup chars = 2+2 = 4
  }

  test("no duplicates → both fractions zero; all-same → both approach 1") {
    val (lf0, cf0) = metrics(Seq("a", "b", "c"))
    assert(lf0 === 0.0 && cf0 === 0.0)
    val (lf1, cf1) = metrics(Seq("xyz", "xyz", "xyz"))
    assert(lf1 === 2.0 / 3 && cf1 === 1.0)
  }

  test("top-run fraction: the most frequent bigram's share, sort-based") {
    val got = Seq(Tuple1("a b a b a c".split(" ").toSeq)).toDF("tk")
      .select(Repetition.topRunFrac(Repetition.wordBigrams(col("tk"))))
      .as[Double].collect().head
    // bigrams: "a b","b a","a b","b a","a c" → top "a b" (or "b a") = 2 of 5
    assert(got === 0.4)
  }

  test("degenerate inputs: empty and single-token arrays") {
    val got = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("only"), Seq("one")))
      .toDF("lines", "tk")
      .select(Repetition.dupLineFrac(col("lines")),
        Repetition.dupCharFrac(col("lines")),
        Repetition.topRunFrac(Repetition.wordBigrams(col("tk"))))
      .as[(Double, Double, Double)].collect().toSeq
    got.foreach { case (a, b, c) => assert(a === 0.0 && b === 0.0 && c === 0.0) }
  }
}
