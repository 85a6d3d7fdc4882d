package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class UrlCodecSpec extends AnyFunSuite {

  test("canonicalize: lowercase scheme+host, strip fragment/default port") {
    assert(UrlCodec.canonicalize("HTTP://ExAmPle.COM:80/Path/To#frag") ===
      "http://example.com/Path/To")
    assert(UrlCodec.canonicalize("https://Example.com:443/") === "https://example.com/")
    assert(UrlCodec.canonicalize("https://example.com:8443/x") ===
      "https://example.com:8443/x")
  }

  test("canonicalize: path normalization") {
    assert(UrlCodec.canonicalize("http://h//a///b/./c/../d") === "http://h/a/b/d")
    assert(UrlCodec.canonicalize("http://h/../..") === "http://h/")
    assert(UrlCodec.canonicalize("http://h") === "http://h/")
    assert(UrlCodec.canonicalize("http://h/a/") === "http://h/a/")
  }

  test("canonicalize: query and userinfo") {
    assert(UrlCodec.canonicalize("http://u:p@h/a?x=1&y=2") === "http://h/a?x=1&y=2")
    assert(UrlCodec.canonicalize("http://h/a?") === "http://h/a")
    assert(UrlCodec.canonicalize("  http://h/a  ") === "http://h/a")
    assert(UrlCodec.canonicalize("example.com/a") === "http://example.com/a")
  }

  test("canonicalize is idempotent") {
    val urls = Seq("HTTP://A.B:80//x/../y#z", "https://Q.co/p?a=1", "h.com",
      "http://h/a/b/", "http://u@H.io:9/x")
    urls.foreach { u =>
      val c = UrlCodec.canonicalize(u)
      assert(UrlCodec.canonicalize(c) === c, s"not idempotent for $u")
    }
  }

  test("host/path extraction") {
    assert(UrlCodec.hostOf("http://example.com:8443/a/b?q") === "example.com")
    assert(UrlCodec.pathOf("http://example.com/a/b?q=1") === "/a/b")
    assert(UrlCodec.pathOf("http://example.com") === "/")
  }

  test("strip_tracking: utm family and exact-name trackers drop, rest sorts") {
    val st = UrlCodec.stripTracking _
    assert(st("https://e.com/p?utm_source=x&id=7&utm_campaign=y") ===
      "https://e.com/p?id=7")
    assert(st("https://e.com/p?b=2&a=1&gclid=abc") === "https://e.com/p?a=1&b=2")
    // tracking-only query drops the '?' entirely; no query is identity
    assert(st("https://e.com/p?fbclid=z") === "https://e.com/p")
    assert(st("https://e.com/p") === "https://e.com/p")
    assert(st(null) === null)
  }

  test("strip_tracking edges: name boundaries, bare params, empty components") {
    val st = UrlCodec.stripTracking _
    // 'utm' and 'utmx' are NOT the utm_ family; 'ref' matches exactly,
    // 'refx' does not; a value containing '=' splits at the FIRST '='
    assert(st("https://e.com/p?utm=1&utmx=2&refx=3") ===
      "https://e.com/p?refx=3&utm=1&utmx=2")
    assert(st("https://e.com/p?ref=home&q=a=b") === "https://e.com/p?q=a=b")
    // bare (valueless) params participate; empty '&&' components vanish
    assert(st("https://e.com/p?flag&&a=1") === "https://e.com/p?a=1&flag")
    // repeated params all survive, sorted stably as full components
    assert(st("https://e.com/p?a=2&a=1") === "https://e.com/p?a=1&a=2")
    // idempotent
    assert(st(st("https://e.com/p?b=2&a=1&gclid=x")) ===
      st("https://e.com/p?b=2&a=1&gclid=x"))
  }
}
