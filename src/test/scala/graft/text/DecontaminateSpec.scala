package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the eval-overlap decontamination contract: excerpt detection,
  * normalization, the minHits floor, and short-text edges.
  */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val evalQ =
    "what is the capital of france and which river flows through it"

  private def flagged(docs: Seq[(Long, String)], evals: Seq[String],
      n: Int = 8, minHits: Long = 3L): Map[Long, Long] =
    Decontaminate.overlap(docs.toDF("doc_id", "text"), "doc_id", "text",
        evals.toDF("text"), "text", n, minHits)
      .as[(Long, Long)].collect().toMap

  test("a doc quoting an eval question is flagged; unrelated docs are not") {
    val got = flagged(Seq(
      (1L, s"trivia night transcript: $evalQ according to the quiz master"),
      (2L, "an entirely different passage about spark shuffle partitions and codegen stages here")),
      Seq(evalQ))
    assert(got.contains(1L) && !got.contains(2L))
    // 12-token question, 8-gram windows: 5 grams inside the quote
    assert(got(1L) === 5L)
  }

  test("case and whitespace variants of the eval text still match") {
    val got = flagged(Seq(
      (1L, "WHAT  IS   THE Capital OF France and WHICH river flows through it today")),
      Seq(evalQ), minHits = 1L)
    assert(got.contains(1L))
  }

  test("minHits floor: a single shared gram does not flag") {
    // exactly one 8-gram in common (the eval text itself, 8 tokens)
    val doc = Seq((1L, "alpha beta the capital of france and which river flows gamma"))
    val ev = Seq("the capital of france and which river flows")
    assert(flagged(doc, ev, minHits = 3L).isEmpty)
    assert(flagged(doc, ev, minHits = 1L) === Map(1L -> 1L))
  }

  test("texts shorter than n tokens produce no grams on either side") {
    val got = flagged(Seq((1L, "too short"), (2L, "")), Seq("also short"), minHits = 1L)
    assert(got.isEmpty)
  }
}
