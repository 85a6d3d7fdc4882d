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
}
