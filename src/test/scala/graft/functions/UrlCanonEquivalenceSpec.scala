package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** r6: the canonicalizer was rewritten as a single-pass index walk for the
  * frontier hot path. This spec diff-tests it against a verbatim copy of
  * the original substring/split implementation over the rule corpus plus a
  * structured generator sweep — output must be CHARACTER-IDENTICAL on every
  * input (the frontier dedup key and four oracled queries hash it).
  */
class UrlCanonEquivalenceSpec extends AnyFunSuite {

  /** Verbatim copy of the pre-r6 implementation (the reference). */
  private def canonicalizeRef(raw: String): String = {
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
    val pathAndQuery = rest.substring(pathStart)

    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1)
    var host = authority
    var port = ""
    val colon = authority.lastIndexOf(':')
    if (colon >= 0 && authority.indexOf(']') < colon) {
      host = authority.substring(0, colon)
      port = authority.substring(colon + 1)
    }
    host = host.toLowerCase.stripSuffix(".")
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443") || port.isEmpty
    val hostPort = if (defaultPort) host else host + ":" + port

    val qIdx = pathAndQuery.indexOf('?')
    var path = if (qIdx >= 0) pathAndQuery.substring(0, qIdx) else pathAndQuery
    val query = if (qIdx >= 0) pathAndQuery.substring(qIdx + 1) else ""

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

  private def check(u: String): Unit =
    assert(UrlCodec.canonicalize(u) === canonicalizeRef(u), s"input <$u>")

  test("hand-picked rule corpus matches the reference byte for byte") {
    Seq(
      null, "", " ", "  \t ", "#", "x#y", "http://A.B/", "HTTP://Host3.Example.COM:80/p/./x/../77#f",
      "https://U:p@Host4.Example.ORG:443/x/9/y/?q=1", "//proto-relative.com/a",
      "://weird", "a://b", "/path://x", "example.com", "example.com?q=1",
      "http://h:8080/a", "http://h:80/a", "https://h:443/a", "https://h:80/a",
      "http://h:/a", "http://h./a", "http://h../a", "http://[::1]:8080/x",
      "http://[::1]/x", "http://u@h/p", "http://a@b@h/p", "http://h",
      "http://h/", "http://h//a//b", "http://h/./", "http://h/a/../..",
      "http://h/a/../../b", "http://h/a/b/../c/./d/", "http://h/..",
      "http://h/...", "http://h/a%20b/c", "http://h/?", "http://h/?#f",
      "http://h/p?a=1&b=2", "http://h/p?a=1?b=2", "http://h/p??",
      "HTTPS://H/P?Q=UPPER", "ftp://Mixed.Case/Path", "h\u00dcst.com/x",
      "http://\u00dcber.example/x", "http://h/\u00fc/..", " \thttp://h/x\n ",
      "http://h#", "http://h?#", "http://h:99999/x", "http://:80/x",
      "http://@h/x", "http://h:x/y", "http://h:80x/y", "http://]:80/x",
      "http://[v6]:80:90/x", "?justquery", "/just/path", "//h", "///x"
    ).foreach(check)
  }

  test("structured generator sweep matches the reference") {
    val schemes = Seq("", "http://", "HTTP://", "https://", "HtTpS://", "ftp://", "//")
    val hosts = Seq("h.com", "H.Com", "h.com.", "U:p@H.com", "[::1]", "h", "")
    val ports = Seq("", ":80", ":443", ":8080", ":")
    val paths = Seq("", "/", "/a", "/a/", "/a/./b", "/a/../b", "/../..", "//x//",
      "/a/b/c/../../d/", "/.")
    val queries = Seq("", "?", "?a=1", "?a=1&b=2", "?x?y")
    val frags = Seq("", "#", "#frag")
    for (s <- schemes; h <- hosts; po <- ports; p <- paths; q <- queries; f <- frags)
      check(s + h + po + p + q + f)
  }

  test("seeded random ascii soup never diverges") {
    val rnd = new scala.util.Random(42)
    val alphabet = "aA/:.?#@[]%&=\u00fc \t0129-_~"
    (0 until 20000).foreach { _ =>
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb += alphabet(rnd.nextInt(alphabet.length)))
      check(sb.toString)
    }
  }
}
