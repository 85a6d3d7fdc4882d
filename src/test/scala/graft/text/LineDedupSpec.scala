package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins corpus-level line dedup: the census counts DISTINCT docs (not
  * occurrences), the threshold is a sharp ≥, normalization merges
  * case/whitespace variants while output keeps lines verbatim, order is
  * preserved on rebuild, fully-dropped docs survive with empty text, and
  * the plan stays UDF-free with the big side never single-partitioned.
  */
class LineDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // boiler in all 4 docs (df=4); "semi" in 3 (df=3); "pair" in 2 (df=2);
  // unique content per doc. Doc 40 is ALL template. Doc 10 repeats boiler
  // twice WITHIN the doc (must still count df=4, not 5).
  private lazy val docs = Seq(
    (10L, Seq("alpha content one", "Boiler  Plate", "semi common", "boiler plate")),
    (20L, Seq("boiler plate", "beta content two", "semi common", "pair line")),
    (30L, Seq("semi common", "gamma content three", "BOILER PLATE", "pair line")),
    (40L, Seq("boiler plate"))
  ).toDF("doc_id", "lines")

  private def run(minDf: Long) =
    LineDedup.dropCommonLines(docs, "doc_id", "lines", minDf)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("census is distinct-doc frequency, not occurrence count") {
    val df = LineDedup.lineDocFreq(docs, "doc_id", "lines")
      .withColumn("probe", lit(1)).drop("probe")
      .as[(Long, Long)].collect().toMap
    val bk = spark.range(1).select(xxhash64(lit("boiler plate"))).as[Long].head()
    assert(df(bk) === 4L) // doc 10's double occurrence counts once
  }

  test("minDf=4 drops only the everywhere-line; variants merge; order kept") {
    val got = run(4)
    // doc 10: both boiler variants (one mixed-case double-spaced) dropped
    assert(got(10L) === ((10L, "alpha content one\nsemi common", 2L, 2L)))
    // doc 30: upper-case variant dropped, rest kept verbatim in order
    assert(got(30L) === ((30L, "semi common\ngamma content three\npair line", 3L, 1L)))
  }

  test("threshold is a sharp >=: df==minDf dropped, df==minDf-1 kept") {
    val got3 = run(3) // drops boiler (4) and semi (3); keeps pair (2)
    assert(got3(20L) === ((20L, "beta content two\npair line", 2L, 2L)))
    val got2 = run(2) // pair (2) now dropped too
    assert(got2(20L) === ((20L, "beta content two", 1L, 3L)))
  }

  test("a fully-templated doc survives with empty text and full drop count") {
    val got = run(2)
    assert(got(40L) === ((40L, "", 0L, 1L)))
    assert(got.size === 4)
  }

  test("plan: no UDF; exploded side never moves to a single partition") {
    val plan = LineDedup.dropCommonLines(docs, "doc_id", "lines", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("batchevalpython"),
      plan.take(2000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
  }
}
