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

  /** r6: single-pass index walk over the input — byte-for-byte the same
    * output as the original substring/split/ArrayBuffer implementation
    * (UrlCodecSpec rules; UrlCanonEquivalenceSpec diff-tests the two over
    * the rule corpus + a generator sweep), with two allocations per call
    * (segment stack + output builder) instead of ~a dozen. The frontier
    * gate evaluates this on every candidate URL twice per round (both
    * branches of the bloom-dedup union), so the constant matters
    * (guide §1.2 step 2).
    *
    * Lowercasing is manual ASCII `A-Z` → `a-z` for all-ASCII scheme/host
    * (the only case the old `String.toLowerCase` could differ is a
    * non-default JVM locale, which this engine never runs under) and falls
    * back to `String.toLowerCase` when the region contains non-ASCII.
    */
  def canonicalize(raw: String): String = {
    if (raw == null) return null
    val n = raw.length
    // trim (String.trim semantics: strip chars <= ' ')
    var b = 0
    var e = n
    while (b < e && raw.charAt(b) <= ' ') b += 1
    while (e > b && raw.charAt(e - 1) <= ' ') e -= 1
    // drop fragment: first '#' onwards
    var i = b
    while (i < e && raw.charAt(i) != '#') i += 1
    e = i

    // scheme: first "://" at position > 0 (relative to trimmed start)
    var schemeB = -1
    var schemeE = -1 // [schemeB, schemeE) or -1 -> default "http"
    var restB = b
    i = b
    var found = false
    while (i + 2 < e && !found) {
      if (raw.charAt(i) == ':' && raw.charAt(i + 1) == '/' && raw.charAt(i + 2) == '/') {
        if (i > b) { schemeB = b; schemeE = i; restB = i + 3 }
        else restB = b // "://..." at pos 0: scheme stays default, rest unchanged
        found = true
      }
      i += 1
    }
    if (!found && e - b >= 2 && raw.charAt(b) == '/' && raw.charAt(b + 1) == '/')
      restB = b + 2

    // authority ends at the first '/' or '?' of rest
    var pathStart = e
    i = restB
    while (i < pathStart) {
      val c = raw.charAt(i)
      if (c == '/' || c == '?') pathStart = i
      i += 1
    }
    // userinfo: keep only after the last '@' of the authority
    var hostB = restB
    i = pathStart - 1
    var at = -1
    while (i >= restB && at < 0) {
      if (raw.charAt(i) == '@') at = i
      i -= 1
    }
    if (at >= 0) hostB = at + 1
    // port: last ':' of the authority, unless inside a [v6] literal
    var hostE = pathStart
    var portB = -1 // [portB, pathStart) when >= 0
    i = pathStart - 1
    var colon = -1
    while (i >= hostB && colon < 0) {
      if (raw.charAt(i) == ':') colon = i
      i -= 1
    }
    if (colon >= 0) {
      var bracket = -1
      i = hostB
      while (i < pathStart && bracket < 0) {
        if (raw.charAt(i) == ']') bracket = i
        i += 1
      }
      // old code compared authority-relative indices; relative and absolute
      // comparisons agree because both are offsets from the same base
      if (bracket < colon) { hostE = colon; portB = colon + 1 }
    }
    // strip one trailing '.' on host (stripSuffix semantics)
    if (hostE > hostB && raw.charAt(hostE - 1) == '.') hostE -= 1

    // path / query split at the first '?' at or after pathStart
    var qIdx = -1
    i = pathStart
    while (i < e && qIdx < 0) {
      if (raw.charAt(i) == '?') qIdx = i
      i += 1
    }
    val pathE = if (qIdx >= 0) qIdx else e
    val queryB = if (qIdx >= 0) qIdx + 1 else e // [queryB, e)

    // scheme text + default-port test (scheme is output lowercased)
    val schemeIsDefault = schemeB < 0
    val httpScheme = schemeIsDefault ||
      regionEqualsLower(raw, schemeB, schemeE, "http")
    val httpsScheme = !schemeIsDefault &&
      regionEqualsLower(raw, schemeB, schemeE, "https")
    val portEmpty = portB < 0 || portB == pathStart
    val defaultPort = portEmpty ||
      (httpScheme && regionEquals(raw, portB, pathStart, "80")) ||
      (httpsScheme && regionEquals(raw, portB, pathStart, "443"))

    // normalize path segments: non-empty, not ".", ".." pops
    // segment stack as (start, end) index pairs
    var segs = new Array[Int](16)
    var nSegs = 0
    i = pathStart
    while (i < pathE) {
      var j = i
      while (j < pathE && raw.charAt(j) != '/') j += 1
      val len = j - i
      if (len > 0 && !(len == 1 && raw.charAt(i) == '.')) {
        if (len == 2 && raw.charAt(i) == '.' && raw.charAt(i + 1) == '.') {
          if (nSegs > 0) nSegs -= 1
        } else {
          if (nSegs * 2 == segs.length) segs = java.util.Arrays.copyOf(segs, segs.length * 2)
          segs(nSegs * 2) = i
          segs(nSegs * 2 + 1) = j
          nSegs += 1
        }
      }
      i = j + 1
    }
    val trailingSlash = nSegs > 0 && pathE > pathStart && raw.charAt(pathE - 1) == '/'

    val out = new java.lang.StringBuilder(e - b + 8)
    if (schemeIsDefault) out.append("http")
    else appendLower(out, raw, schemeB, schemeE)
    out.append("://")
    appendLower(out, raw, hostB, hostE)
    if (!defaultPort) {
      out.append(':')
      out.append(raw, portB, pathStart)
    }
    if (nSegs == 0) out.append('/')
    else {
      i = 0
      while (i < nSegs) {
        out.append('/')
        out.append(raw, segs(i * 2), segs(i * 2 + 1))
        i += 1
      }
      if (trailingSlash) out.append('/')
    }
    if (queryB < e) {
      out.append('?')
      out.append(raw, queryB, e)
    }
    out.toString
  }

  /** Does raw[b,e) equal `lit` after ASCII-lowercasing raw? (lit is
    * lowercase ASCII.)
    */
  private def regionEqualsLower(raw: String, b: Int, e: Int, lit: String): Boolean = {
    if (e - b != lit.length) return false
    var i = 0
    while (i < lit.length) {
      var c = raw.charAt(b + i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if (c != lit.charAt(i)) return false
      i += 1
    }
    true
  }

  private def regionEquals(raw: String, b: Int, e: Int, lit: String): Boolean = {
    if (e - b != lit.length) return false
    var i = 0
    while (i < lit.length) {
      if (raw.charAt(b + i) != lit.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Append raw[b,e) lowercased: manual `A-Z` map when all-ASCII, exact
    * `String.toLowerCase` fallback otherwise (Unicode case mapping can
    * change length — e.g. İ — which the manual path must not touch).
    */
  private def appendLower(out: java.lang.StringBuilder, raw: String, b: Int, e: Int): Unit = {
    var i = b
    var ascii = true
    while (i < e && ascii) {
      if (raw.charAt(i) >= 128) ascii = false
      i += 1
    }
    if (!ascii) { out.append(raw.substring(b, e).toLowerCase); return }
    i = b
    while (i < e) {
      val c = raw.charAt(i)
      out.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
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
