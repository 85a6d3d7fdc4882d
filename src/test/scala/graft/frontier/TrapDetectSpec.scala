package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins trap semantics: digit-collapse templating, the census counts, the
  * two-sided trap predicate (volume AND low diversity), and that the
  * scheduling view exposes exactly the flagged (host, template) pairs.
  */
class TrapDetectSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // h1 /cal/N : 120 URLs, 3 distinct contents  → trap
  // h1 /p/N   : 120 URLs, 120 distinct contents → healthy (high diversity)
  // h2 /cal/N : 40 URLs, 1 content              → below minUrls, not flagged
  private val urls =
    ((0 until 120).map(i => ("h1", s"/cal/$i", s"c${i % 3}")) ++
     (0 until 120).map(i => ("h1", s"/p/$i", s"c$i")) ++
     (0 until 40).map(i => ("h2", s"/cal/$i", "c0")))
      .toDF("host", "path", "content")

  test("digit runs collapse to one template marker each") {
    val got = Seq(("h", "/2024/01/p5x77", "c")).toDF("host", "path", "content")
    val tpl = TrapDetect.urlTemplates(got, "host", "path", "content")
      .select("template").as[String].collect().head
    assert(tpl === "/N/N/pNxN")
  }

  test("census counts distinct URLs and distinct contents per template") {
    val got = TrapDetect.urlTemplates(urls, "host", "path", "content")
      .select("host", "template", "n_urls", "n_content")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("h1", "/cal/N", 120L, 3L),
      ("h1", "/p/N", 120L, 120L),
      ("h2", "/cal/N", 40L, 1L)))
  }

  test("trap predicate needs BOTH volume and low diversity") {
    val flagged = TrapDetect.flagTraps(
      TrapDetect.urlTemplates(urls, "host", "path", "content"),
      minUrls = 100L, maxContentRatio = 0.1)
      .filter(col("is_trap") === 1)
      .select("host", "template").as[(String, String)].collect().toSet
    assert(flagged === Set(("h1", "/cal/N")))
  }

  test("trapTemplates exposes exactly the flagged pairs for scheduling") {
    val got = TrapDetect.trapTemplates(urls, "host", "path", "content")
      .as[(String, String)].collect().toSet
    assert(got === Set(("h1", "/cal/N")))
  }
}
