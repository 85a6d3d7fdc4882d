package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class TfIdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "apple apple banana cherry"),
    (1L, "banana cherry cherry"),
    (2L, "cherry date"),
    (3L, "   "))

  test("hand-computed scores and ranks on a four-doc corpus") {
    // N = 4 (the empty doc counts toward N, contributes no terms)
    // df: apple 1, banana 2, cherry 3, date 1
    val docs = corpus.toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 5)
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._6)).toMap
    def idf(df: Long): Double = math.log(5.0 / (df + 1.0)) + 1.0
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc0: apple tf=2·idf(1)≈most salient, then banana/cherry tf=1
    val d0 = got(0L)
    assert(d0.map(_._2).toSeq === Seq("apple", "banana", "cherry"))
    assert(d0.head._5 === r6(2 * idf(1)))
    assert(d0(1)._5 === r6(idf(2)))
    // doc2: date (rare) outranks cherry (common) at equal tf
    assert(got(2L).map(_._2).toSeq === Seq("date", "cherry"))
    // token-less doc absent
    assert(!got.contains(3L))
  }

  test("equal scores tie-break by term; k truncates") {
    // all terms unique per doc and same df ⇒ identical tfidf ⇒ term order
    val docs = Seq((0L, "zeta alpha mid")).toDF("doc_id", "text")
    val one = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Double, Int)].collect().sortBy(_._6)
    assert(one.map(_._2).toSeq === Seq("alpha", "mid"))
    assert(one.map(_._6).toSeq === Seq(1, 2))
  }
}
