package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the key-normalization step ahead of the xxhash64
  * frontier key (north_rule: "bloom/cuckoo URL-seen ... keyed by
  * canonicalized-URL xxhash64"). Pure, deterministic, allocation-light;
  * exposed to Catalyst via [[GraftExpressions.CanonicalizeUrl]].
  *
  * Rules (fixed spec; unit-pinned in UrlCodecSpec):
  *  1. trim ASCII whitespace
  *  2. drop the fragment (first '#' onwards)
  *  3. lowercase scheme and host; default scheme "http" when missing "//"
  *  4. strip userinfo, strip trailing '.' on host, strip default port
  *     (http:80, https:443); non-default ports kept
  *  5. path: collapse duplicate '/', resolve "." and ".." segments
  *     (".." at root is dropped), empty path → "/"
  *  6. drop a trailing "?" (empty query); otherwise query kept verbatim
  */
object UrlCodec {

  def canonicalize(raw: String): String = {
    if (raw == null) return null
    var s = raw.trim
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)

    var scheme = "http"
    var rest = s
    val schemeEnd = s.indexOf("://")
    if (schemeEnd > 0) {
      scheme = s.substring(0, schemeEnd).toLowerCase
      rest = s.substring(schemeEnd + 3)
    } else if (s.startsWith("//")) {
      rest = s.substring(2)
    }

    val pathStart = {
      val slash = rest.indexOf('/')
      val q = rest.indexOf('?')
      if (slash < 0 && q < 0) rest.length
      else if (slash < 0) q
      else if (q >= 0 && q < slash) q
      else slash
    }
    var authority = rest.substring(0, pathStart)
    var pathAndQuery = rest.substring(pathStart)

    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1)
    var host = authority
    var port = ""
    val colon = authority.lastIndexOf(':')
    if (colon >= 0 && authority.indexOf(']') < colon) { // respect [v6]:port
      host = authority.substring(0, colon)
      port = authority.substring(colon + 1)
    }
    host = host.toLowerCase.stripSuffix(".")
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443") || port.isEmpty
    val hostPort = if (defaultPort) host else host + ":" + port

    val qIdx = pathAndQuery.indexOf('?')
    var path = if (qIdx >= 0) pathAndQuery.substring(0, qIdx) else pathAndQuery
    var query = if (qIdx >= 0) pathAndQuery.substring(qIdx + 1) else ""

    // normalize path segments
    val segs = path.split("/", -1).toList.filter(x => x.nonEmpty && x != ".")
    val stack = new scala.collection.mutable.ArrayBuffer[String]()
    segs.foreach {
      case ".." => if (stack.nonEmpty) stack.remove(stack.length - 1)
      case seg  => stack += seg
    }
    val trailingSlash = path.endsWith("/") && stack.nonEmpty
    path = "/" + stack.mkString("/") + (if (trailingSlash) "/" else "")
    if (stack.isEmpty) path = "/"

    val qPart = if (query.isEmpty) "" else "?" + query
    scheme + "://" + hostPort + path + qPart
  }

  def canonicalizeU(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(canonicalize(s.toString))

  /** Host component of a canonical URL (no port). Empty string on no host. */
  def hostOf(canonicalUrl: String): String = {
    if (canonicalUrl == null) return null
    val i = canonicalUrl.indexOf("://")
    if (i < 0) return ""
    val rest = canonicalUrl.substring(i + 3)
    var end = rest.length
    var j = 0
    var found = false
    while (j < rest.length && !found) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == ':') { end = j; found = true }
      j += 1
    }
    rest.substring(0, end)
  }

  def hostOfU(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(hostOf(s.toString))

  /** Path component (with leading '/', no query) of a canonical URL. */
  def pathOf(canonicalUrl: String): String = {
    if (canonicalUrl == null) return null
    val i = canonicalUrl.indexOf("://")
    if (i < 0) return "/"
    val rest = canonicalUrl.substring(i + 3)
    val slash = rest.indexOf('/')
    if (slash < 0) return "/"
    val q = rest.indexOf('?', slash)
    if (q < 0) rest.substring(slash) else rest.substring(slash, q)
  }

  def pathOfU(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(pathOf(s.toString))

  /** Exact-name tracking parameters (plus the `utm_*` prefix family) that
    * identify a CLICK, not a page — two URLs differing only in these are
    * the same document, and a seen-set keyed without stripping them
    * re-fetches every page once per campaign link.
    */
  private val TrackingParams = Set("gclid", "fbclid", "msclkid", "yclid",
    "igshid", "mc_eid", "_ga", "_gl", "spm", "ref", "ref_src")

  /** Aggressive dedup-key canonicalization LAYERED ON TOP of
    * [[canonicalize]] (which is deliberately conservative — it never alters
    * the query, so the fetch URL stays exactly what the site expects):
    * drop tracking parameters (`utm_*` prefix + the exact-name set above,
    * both lowercase by convention — real trackers are), then sort the
    * surviving `k=v` components bytewise so parameter ORDER stops mattering
    * (`?b=2&a=1` keys equal to `?a=1&b=2`). Empty query after stripping
    * drops the `?` entirely. Components split on `&`; names end at the
    * first `=`; empty components vanish. Fragmentless input assumed (the
    * canonicalizer already cut `#…`).
    *
    * Use for the SEEN-SET / frontier-dedup key; fetch with the
    * conservative canonical form.
    */
  def stripTracking(url: String): String = {
    if (url == null) return null
    val q = url.indexOf('?')
    if (q < 0) return url
    val base = url.substring(0, q)
    val kept = url.substring(q + 1).split("&").toIndexedSeq
      .filter(_.nonEmpty)
      .filterNot { p =>
        val name = p.takeWhile(_ != '=')
        name.startsWith("utm_") || TrackingParams.contains(name)
      }
      .sorted
    if (kept.isEmpty) base else base + "?" + kept.mkString("&")
  }

  def stripTrackingU(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(stripTracking(s.toString))
}
