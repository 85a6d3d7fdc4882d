package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** U11: webhook ingress HMAC-SHA256 verification
  * (/root/reference/cmd/transmuted/main.go:67-72).
  */
class PushIngestHmacSpec extends AnyFunSuite {

  private val key = "whsec_test_signing_key"
  private val body = """{"data":{"block":{"number":100}}}"""
    .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("a correctly signed body verifies") {
    val sig = PushIngest.sign(body, key)
    assert(sig.length === 64 && sig.forall(c => c.isDigit || (c >= 'a' && c <= 'f')))
    assert(PushIngest.isValidSignature(body, key, sig))
  }

  test("tampered body, wrong key, or wrong signature all fail") {
    val sig = PushIngest.sign(body, key)
    val tampered = body.clone(); tampered(5) = 'X'.toByte
    assert(!PushIngest.isValidSignature(tampered, key, sig))
    assert(!PushIngest.isValidSignature(body, "other_key", sig))
    assert(!PushIngest.isValidSignature(body, key, sig.reverse))
    assert(!PushIngest.isValidSignature(body, key, null))
  }

  test("known vector (RFC 4231-style cross-check)") {
    // HMAC-SHA256("key", "The quick brown fox jumps over the lazy dog")
    val v = PushIngest.sign(
      "The quick brown fox jumps over the lazy dog".getBytes("UTF-8"), "key")
    assert(v === "f7bc83f430538424b13298e6aa6fb143ef4d59a14946175997479dbc2d1a3cd8")
  }
}
