package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap XML extraction — the crawl discovery source besides page
  * out-links (a polite crawler reads /sitemap.xml before walking; see the
  * reference's single-source walk at
  * /root/reference/crawler/blocks.go:60-63, which has no analog because a
  * chain has exactly one "next" — a web frontier seeds from sitemaps).
  *
  * Parses both document kinds of the sitemaps.org protocol from a text
  * column holding the fetched XML:
  *   - urlset entries  → kind = "url"     (crawlable page locations)
  *   - sitemapindex    → kind = "sitemap" (child sitemaps to fetch next —
  *     the caller loops, exactly like frontier out-link expansion)
  *
  * Columnar fast path: the extraction is anchored regexp pulls over
  * `<url>`/`<sitemap>` blocks — pure codegen expressions, scan-speed over a
  * fetched-bodies table, no UDF and no driver work. The supported XML
  * subset (element layout per the protocol spec, the five predefined
  * entities in `<loc>`) covers protocol-conformant sitemaps; arbitrary-XML
  * edge cases (CDATA, comments inside entries) belong to a full parser
  * behind the same column contract.
  */
object Sitemap {

  /** Explode each XML document into its entries:
    * (…idCols, kind, loc, lastmod) — `lastmod` null when absent, `loc`
    * XML-unescaped and trimmed; entries with an empty `<loc>` are dropped.
    */
  def parse(df: DataFrame, xmlCol: String, idCols: Seq[String]): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?s)<(url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(0))
    df.select(idCols.map(col) :+ explode(blocks).as("__b"): _*)
      .select(idCols.map(col) :+
        regexp_extract(col("__b"), "^<(url|sitemap)>", 1).as("kind") :+
        unescapeXml(trim(regexp_extract(col("__b"),
          "(?s)<loc>(.*?)</loc>", 1))).as("loc") :+
        when(col("__b").rlike("<lastmod>"),
          trim(regexp_extract(col("__b"), "(?s)<lastmod>(.*?)</lastmod>", 1)))
          .otherwise(lit(null).cast("string")).as("lastmod"): _*)
      .filter(length(col("loc")) > 0)
  }

  /** `Sitemap:` directives from fetched robots.txt bodies — the OTHER
    * discovery edge of the protocol (robots.txt advertises the sitemaps;
    * [[parse]] then expands them). Per sitemaps.org the directive is
    * GLOBAL (independent of user-agent groups), the key case-insensitive,
    * the value an absolute URL; `#` starts a comment (full-line comments
    * are skipped, trailing comments stripped — sitemap URLs carry no
    * fragment in practice, which the protocol's absolute-URL examples
    * reflect). One codegen `regexp_extract_all` + explode — the same
    * scan-speed shape as [[parse]], no UDF, no driver work; this stays
    * columnar precisely so a 10^8-host robots table is one pass.
    */
  def fromRobots(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val urls = regexp_extract_all(col(textCol),
      lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*([^#\\r\\n]+)"), lit(1))
    df.select(idCols.map(col) :+ explode(urls).as("sitemap_url"): _*)
      .withColumn("sitemap_url", trim(col("sitemap_url")))
      .filter(length(col("sitemap_url")) > 0)
  }

  /** The five predefined XML entities, `&amp;` last so `&amp;lt;` decodes
    * to the literal `&lt;` (double-escape safety), matching every
    * conformant serializer's inverse.
    */
  def unescapeXml(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
  }
}
