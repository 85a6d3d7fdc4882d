package graft.frontier

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SitemapSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def parse(xml: String) =
    Sitemap.parse(Seq((1L, xml)).toDF("id", "xml"), "xml", Seq("id"))
      .as[(Long, String, String, Option[String])].collect().toSeq

  test("urlset: loc trimmed + unescaped, lastmod optional, entry order kept") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://ex.com/a?x=1&amp;y=2 </loc>
        |    <lastmod>2026-01-15</lastmod>
        |  </url>
        |  <url><loc>https://ex.com/b</loc></url>
        |</urlset>""".stripMargin
    val got = parse(xml)
    assert(got === Seq(
      (1L, "url", "https://ex.com/a?x=1&y=2", Some("2026-01-15")),
      (1L, "url", "https://ex.com/b", None)))
  }

  test("sitemapindex entries come back kind=sitemap") {
    val xml = "<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc>" +
      "<lastmod>2025-12-01</lastmod></sitemap>" +
      "<sitemap><loc>https://ex.com/s2.xml</loc></sitemap></sitemapindex>"
    assert(parse(xml) === Seq(
      (1L, "sitemap", "https://ex.com/s1.xml", Some("2025-12-01")),
      (1L, "sitemap", "https://ex.com/s2.xml", None)))
  }

  test("empty loc dropped; all five entities decode; double-escape is safe") {
    val xml = "<urlset><url><loc></loc></url>" +
      "<url><loc>https://ex.com/?q=&lt;a&gt;&quot;&apos;&amp;lt;</loc></url></urlset>"
    val got = parse(xml)
    assert(got === Seq((1L, "url", "https://ex.com/?q=<a>\"'&lt;", None)))
  }

  test("non-sitemap text and documents with zero entries yield no rows") {
    assert(parse("<html><body>not a sitemap</body></html>").isEmpty)
    assert(parse("").isEmpty)
  }

  private def fromRobots(body: String) =
    Sitemap.fromRobots(Seq((1L, body)).toDF("id", "body"), "body", Seq("id"))
      .as[(Long, String)].collect().toSeq

  test("robots Sitemap: directives — key case/whitespace variants, order kept") {
    val body = Seq(
      "User-agent: *",
      "Disallow: /x",
      "Sitemap: https://ex.com/a.xml",
      "  sitemap : https://ex.com/b.xml",
      "SITEMAP:https://ex.com/c.xml").mkString("\n")
    assert(fromRobots(body).map(_._2) === Seq(
      "https://ex.com/a.xml", "https://ex.com/b.xml", "https://ex.com/c.xml"))
  }

  test("robots sitemap comments: full-line skipped, trailing stripped") {
    val body = Seq(
      "# Sitemap: https://ex.com/commented.xml",
      "Sitemap: https://ex.com/real.xml # refreshed nightly",
      "Sitemap:   ").mkString("\n")
    assert(fromRobots(body) === Seq((1L, "https://ex.com/real.xml")))
  }

  test("robots with no directives yields no rows; null-safe") {
    assert(fromRobots("User-agent: *\nDisallow:").isEmpty)
    assert(fromRobots("").isEmpty)
  }
}
