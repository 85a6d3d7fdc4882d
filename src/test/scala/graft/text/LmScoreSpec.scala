package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("hand-computed add-k scores on a two-doc corpus") {
    // bigrams: doc0 = (a,b),(b,a),(a,b); doc1 = (a,c)
    // counts:  C2(a,b)=2 C2(b,a)=1 C2(a,c)=1; C1(a)=3 C1(b)=1; |V|=3, k=0.5
    val docs = Seq((0L, "a b a b"), (1L, "a c")).toDF("doc_id", "text")
    val got = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val pAB = (2 + 0.5) / (3 + 0.5 * 3)
    val pBA = (1 + 0.5) / (1 + 0.5 * 3)
    val pAC = (1 + 0.5) / (3 + 0.5 * 3)
    assert(got(0L)._1 === 3L)
    assert(math.abs(got(0L)._2 - -(math.log(pAB) * 2 + math.log(pBA)) / 3) < 1e-12)
    assert(got(1L)._1 === 1L)
    assert(math.abs(got(1L)._2 - -math.log(pAC)) < 1e-12)
  }

  test("short and empty documents contribute no score row but do feed |V|") {
    val docs = Seq((0L, "x y x y x y"), (1L, "solo"), (2L, "  ")).toDF("doc_id", "text")
    val got = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    assert(got === Set(0L))
    // |V| = {x, y, solo} = 3: p(y|x) = (3+0.5)/(3+1.5), p(x|y) = (2+0.5)/(2+1.5)
    val nll = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().head._3
    val want = -(math.log(3.5 / 4.5) * 3 + math.log(2.5 / 3.5) * 2) / 5
    assert(math.abs(nll - want) < 1e-12)
  }

  test("corpus-typical text scores lower nll than token salad") {
    val fluent = "the cat sat on the mat"
    val base = (0L until 40L).map(i => (i, fluent))
    val salad = (40L, "mat the on cat sat the")
    val docs = (base :+ salad).toDF("doc_id", "text")
    val scores = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scores(0L) < scores(40L))
  }

  test("minCount floor only reroutes pruned grams to the unseen path") {
    val docs = Seq((0L, "a b a b a b a b"), (1L, "a c")).toDF("doc_id", "text")
    val exact = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val floored = LmScore.bigramNll(docs, "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // doc0's grams all survive the floor: identical score
    assert(math.abs(exact(0L) - floored(0L)) < 1e-12)
    // doc1's (a,c) prunes to the unseen path: strictly worse (higher) nll
    assert(floored(1L) > exact(1L))
  }
}
