package graft.ingest

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Pins WARC framing: byte-exact Content-Length slicing (octets, not
  * chars), payloads containing CRLFs and version-line lookalikes, extra
  * headers passed over, and loud failure on desync-class malformations.
  */
class WarcIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def rec(warcType: String, payload: String,
      uri: Option[String] = None, extra: Seq[String] = Nil): String = {
    val octets = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    val headers = Seq(s"WARC-Type: $warcType") ++
      uri.map(u => s"WARC-Target-URI: $u") ++ extra ++
      Seq(s"Content-Length: $octets")
    "WARC/1.0\r\n" + headers.mkString("\r\n") + "\r\n\r\n" + payload + "\r\n\r\n"
  }

  private def parse(blob: String) =
    WarcIngest.parseBlob(7L,
      blob.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq

  test("multi-record blob round-trips: types, uris, lengths, payloads") {
    val blob = rec("warcinfo", "robots: obey", extra = Seq("WARC-Date: 2026-01-01T00:00:00Z")) +
      rec("response", "line1\r\nline2", uri = Some("https://ex.com/a")) +
      rec("response", "tricky WARC/1.0\r\n\r\n body", uri = Some("https://ex.com/b"))
    val got = parse(blob)
    assert(got.map(_.warc_type) === Seq("warcinfo", "response", "response"))
    assert(got.map(_.rec_idx) === Seq(0, 1, 2))
    assert(got(0).target_uri === None)
    assert(got(1).target_uri === Some("https://ex.com/a"))
    assert(got(1).payload === "line1\r\nline2")
    // a payload containing the version line must not desync record 3
    assert(got(2).payload === "tricky WARC/1.0\r\n\r\n body")
  }

  test("Content-Length counts UTF-8 octets: multibyte payload round-trips") {
    val payload = "中文 café text"
    val got = parse(rec("response", payload, uri = Some("https://ex.com/zh")))
    assert(got.head.payload === payload)
    assert(got.head.content_length ===
      payload.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong)
    assert(got.head.content_length > payload.length) // octets > chars here
  }

  test("malformed framing fails loudly instead of desyncing") {
    val good = rec("response", "ok", uri = Some("https://ex.com"))
    // truncated payload
    intercept[IllegalArgumentException] {
      parse(good.dropRight(6)) // cuts into the payload + trailer
    }
    // missing Content-Length
    intercept[IllegalArgumentException] {
      parse("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")
    }
    // garbage where the version line must be
    intercept[IllegalArgumentException] {
      parse("NOT-WARC\r\n" + good)
    }
  }

  test("empty blob yields no records") {
    assert(parse("").isEmpty)
    assert(parse("\r\n\r\n").isEmpty)
  }

  test("per-record gzip members (the .warc.gz layout) inflate and round-trip") {
    val u = java.nio.charset.StandardCharsets.UTF_8
    val a = rec("warcinfo", "robots: obey")
    val b = rec("response", "中文 payload", uri = Some("https://ex.com/zh"))
    val gz = WarcIngest.gzipMember(a.getBytes(u)) ++
      WarcIngest.gzipMember(b.getBytes(u))
    val got = WarcIngest.parseBlob(7L, WarcIngest.gunzipAll(gz)).toSeq
    assert(got === parse(a + b))
    assert(got(1).payload === "中文 payload")
  }
}
