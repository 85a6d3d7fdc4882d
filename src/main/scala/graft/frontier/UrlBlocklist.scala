package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain blocklist filtering — the crawl-side exclusion list (spam/adult/
  * malware domains) every production frontier applies before scheduling,
  * with standard DOMAIN semantics: blocking `example.com` blocks
  * `a.example.com` and `example.com` itself, but never `notexample.com`.
  *
  * Suffix matching is an equi-join, not a LIKE scan: each host explodes to
  * its ≤ ~10 dot-suffixes (bounded by label count) and equi-joins the
  * broadcast blocklist — so a 10⁶-entry blocklist costs the same per row
  * as a 10-entry one, where the naive `host LIKE '%' || domain` plan is a
  * broadcast nested loop that touches every blocklist entry per row.
  */
object UrlBlocklist {

  /** All dot-suffixes of a host, most-specific first:
    * "news.example.co.uk" → [news.example.co.uk, example.co.uk, co.uk, uk].
    * DNS names are case-insensitive, so suffixes are lowercased here and
    * blocklist entries are lowercased at the join — `UrlCodec.canonicalize`
    * already lowercases hosts, but this operator must also be safe on raw,
    * un-canonicalized input.
    */
  def hostSuffixes(host: Column): Column = {
    val parts = split(lower(host), "\\.")
    transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + lit(1), size(parts) - i), "."))
  }

  /** Rows whose host hits the blocklist, with `matched_domain` appended —
    * the audit/diagnostic side. One output row per (row, matched entry);
    * entries are deduplicated, so non-overlapping blocklists yield one row
    * per blocked URL. Corpus side: one bounded explode + a broadcast
    * equi-join — never shuffles.
    */
  def matches(urls: DataFrame, hostCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame =
    urls.withColumn("matched_domain", explode(hostSuffixes(col(hostCol))))
      .join(broadcast(blocklist.select(lower(col(domainCol)).as("matched_domain")).distinct()),
        Seq("matched_domain"))

  /** The keep side: URLs whose host matches NO blocklist entry. Blocked-ness
    * is a property of the HOST, so the suffix join runs over distinct hosts
    * (distinct-hosts scale, not URL scale) and the corpus anti-joins on
    * host — the key the frontier already partitions by; AQE broadcasts the
    * blocked-host set when it is small.
    */
  def filterBlocked(urls: DataFrame, hostCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    val blockedHosts = urls.select(col(hostCol)).distinct()
      .withColumn("__sfx", explode(hostSuffixes(col(hostCol))))
      .join(broadcast(blocklist.select(lower(col(domainCol)).as("__sfx")).distinct()),
        Seq("__sfx"))
      .select(col(hostCol)).distinct()
    urls.join(blockedHosts, Seq(hostCol), "left_anti")
  }
}
