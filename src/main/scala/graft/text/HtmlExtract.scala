package graft.text

import graft.frontier.Sitemap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-text extraction — the boilerplate-strip step between a
  * fetched-bodies table and every downstream text operator (quality
  * scoring, dedup, LM filtering all assume plain text). The reference
  * walks an API whose payloads are already structured
  * (/root/reference/crawler/blocks.go:96-141); a web crawl's payloads are
  * markup, so this operator is the seam that turns them into the
  * `documents`-shaped column the rest of the pipeline consumes.
  *
  * The pipeline, in order (each step a codegen `regexp_replace` — the
  * whole extraction is one scan-speed projection, no UDF, no shuffle):
  *   1. drop `<script>`/`<style>` ELEMENTS (tag + content — their text is
  *      code, not prose), `<title>` (emitted as its own column, not body
  *      text), and `<!-- -->` comments;
  *   2. drop every remaining tag (content kept);
  *   3. decode the five predefined entities (shared with
  *      [[graft.frontier.Sitemap.unescapeXml]], `&amp;` last for
  *      double-escape safety);
  *   4. collapse whitespace runs to single spaces and trim.
  *
  * All patterns stay in the Java∩RE2 syntax subset (the PII-scrub rule),
  * so the SAME strings replay in an external RE2 engine — which is how the
  * oracle checks the extraction, not just its row count.
  *
  * Like the sitemap parser this is the protocol-conformant columnar fast
  * path: pathological markup (unclosed script tags, CDATA islands,
  * conditional comments) belongs to a full HTML5 parser behind the same
  * column contract.
  */
object HtmlExtract {

  private val dropContent = Seq(
    "(?is)<script\\b[^>]*>.*?</script>",
    "(?is)<style\\b[^>]*>.*?</style>",
    "(?is)<title\\b[^>]*>.*?</title>", // emitted separately by titleOf
    "(?s)<!--.*?-->")

  /** Plain text of one HTML column (the steps above). */
  def textOf(html: Column): Column = {
    val noBlocks = dropContent.foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    trim(regexp_replace(Sitemap.unescapeXml(noTags), "\\s+", " "))
  }

  /** `<title>` content, same unescape + collapse; null when absent. */
  def titleOf(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    val cleaned = trim(regexp_replace(Sitemap.unescapeXml(raw), "\\s+", " "))
    when(length(cleaned) > 0, cleaned).otherwise(lit(null).cast("string"))
  }

  /** Extraction over a fetched-bodies table: keeps `idCols`, adds
    * (title, text, n_links) — `n_links` counts `<a ` anchors, the raw
    * ingredient of the link-density boilerplate signal.
    */
  def extract(df: DataFrame, htmlCol: String, idCols: Seq[String]): DataFrame =
    df.select(idCols.map(col) :+
      titleOf(col(htmlCol)).as("title") :+
      textOf(col(htmlCol)).as("text") :+
      regexp_count(col(htmlCol), lit("(?i)<a[\\s>]")).as("n_links"): _*)
}
