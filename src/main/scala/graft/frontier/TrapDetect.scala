package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-trap detection — URL-template explosion per host.
  *
  * The classic frontier failure the reference never faces (it walks ONE
  * numbered chain upward) but every web crawl does: calendar pages, session
  * IDs, and faceted search generate unbounded URL spaces that serve nearly
  * identical content, and an undefended frontier pours its politeness
  * budget into them. Detection is structural: collapse every digit run in
  * the path to a template (`/archive/2024/01/31` → `/archive/N/N/N`), then
  * per (host, template) compare how many DISTINCT URLs were seen against
  * how many DISTINCT content fingerprints they produced. A trap is a
  * template with many URLs and almost no content diversity.
  *
  * Scale shape: one regexp projection (codegen) and one two-key aggregate
  * with two count-distincts — Catalyst's Expand + partial aggregation keeps
  * it map-side combinable; the key space is (host, template), orders of
  * magnitude smaller than the URL space, so the shuffle carries templates,
  * not URLs. No joins, no driver state. The flagged output is tiny and
  * broadcasts into the frontier's scheduling filter like the blocklist
  * ([[UrlBlocklist.filterBlocked]]).
  */
object TrapDetect {

  /** Template census: (host, template, n_urls, n_content) for every
    * digit-collapsed path template a host served.
    */
  def urlTemplates(urls: DataFrame, hostCol: String, pathCol: String,
      contentCol: String): DataFrame =
    urls
      .withColumn("template", regexp_replace(col(pathCol), "[0-9]+", "N"))
      .groupBy(col(hostCol), col("template"))
      .agg(
        countDistinct(col(pathCol)).as("n_urls"),
        countDistinct(col(contentCol)).as("n_content"))

  /** Flag traps in a template census: templates with at least `minUrls`
    * distinct URLs whose content diversity n_content/n_urls is at most
    * `maxContentRatio`. `is_trap` is kept (0/1) on every row rather than
    * filtering, so the census doubles as the audit view.
    */
  def flagTraps(templates: DataFrame, minUrls: Long = 100L,
      maxContentRatio: Double = 0.1): DataFrame =
    templates.withColumn("is_trap",
      (col("n_urls") >= minUrls &&
        col("n_content").cast("double") <= col("n_urls") * maxContentRatio)
        .cast("int"))

  /** The scheduling side: hosts×templates to exclude, i.e. just the
    * flagged rows — broadcast this against candidate URLs after applying
    * the same digit-collapse to their paths.
    */
  def trapTemplates(urls: DataFrame, hostCol: String, pathCol: String,
      contentCol: String, minUrls: Long = 100L,
      maxContentRatio: Double = 0.1): DataFrame =
    flagTraps(urlTemplates(urls, hostCol, pathCol, contentCol),
      minUrls, maxContentRatio)
      .filter(col("is_trap") === 1)
      .select(col(hostCol), col("template"))
}
