package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins domain-blocking semantics: suffix matches at every depth, no
  * substring false positives, and matches + filterBlocked partition the
  * input.
  */
class UrlBlocklistSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val urls = Seq(
    (1L, "a.example.com"),
    (2L, "example.com"),
    (3L, "notexample.com"),      // substring of a blocked domain — NOT blocked
    (4L, "deep.sub.example.com"),
    (5L, "example.com.evil.org"), // blocked domain as a NON-suffix — NOT blocked
    (6L, "news.bbc.co.uk"),
    (7L, "safe.org"))
    .toDF("id", "host")
  private val blocklist = Seq("example.com", "bbc.co.uk").toDF("domain")

  test("suffix semantics: blocks the domain and every subdomain, never substrings") {
    val got = UrlBlocklist.matches(urls, "host", blocklist, "domain")
      .select(col("id"), col("matched_domain"))
      .as[(Long, String)].collect().toSet
    assert(got === Set(
      (1L, "example.com"), (2L, "example.com"), (4L, "example.com"),
      (6L, "bbc.co.uk")))
  }

  test("filterBlocked keeps exactly the complement") {
    val kept = UrlBlocklist.filterBlocked(urls, "host", blocklist, "domain")
      .select(col("id")).as[Long].collect().toSet
    assert(kept === Set(3L, 5L, 7L))
  }

  test("hostSuffixes enumerates most-specific first") {
    val got = Seq(Tuple1("news.example.co.uk")).toDF("h")
      .select(UrlBlocklist.hostSuffixes(col("h")))
      .as[Seq[String]].collect().head
    assert(got === Seq("news.example.co.uk", "example.co.uk", "co.uk", "uk"))
  }

  test("matching is case-insensitive on both sides (DNS semantics)") {
    val shouting = Seq((1L, "WWW.Example.COM")).toDF("id", "host")
    val mixedList = Seq("EXAMPLE.com").toDF("domain")
    val got = UrlBlocklist.matches(shouting, "host", mixedList, "domain")
      .select(col("id"), col("matched_domain")).as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "example.com")))
    assert(UrlBlocklist.filterBlocked(shouting, "host", mixedList, "domain").count() === 0L)
  }

  test("empty blocklist blocks nothing; matches and filter partition the input") {
    val none = UrlBlocklist.filterBlocked(urls, "host",
      spark.emptyDataset[String].toDF("domain"), "domain").count()
    assert(none === urls.count())
    val blocked = UrlBlocklist.matches(urls, "host", blocklist, "domain")
      .select("id").distinct().count()
    val kept = UrlBlocklist.filterBlocked(urls, "host", blocklist, "domain").count()
    assert(blocked + kept === urls.count())
  }
}
