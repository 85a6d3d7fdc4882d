package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass a multilingual
  * corpus needs before ANY equality-based operator (exact dedup, line dedup,
  * anchor/caption grouping, URL host compare): "café" arrives from the web
  * both precomposed (U+00E9) and decomposed (e + U+0301), and without
  * normalization they hash apart, silently halving dedup recall on the
  * affected text. Kept as a static-call helper so the Catalyst expression's
  * `doGenCode` stays a one-line static invocation (the HexCodec pattern).
  *
  * NFC (not NFKC) deliberately: canonical composition is lossless and
  * universally safe; compatibility folding (NFKC: ﬁ→fi, ²→2) changes
  * meaning and belongs to a caller-chosen tokenizer policy, not the
  * engine's default.
  */
object TextNorm {

  def nfc(s: String): String =
    if (s == null) null
    else if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** UTF8String adapter for codegen static calls. The `isNormalized` fast
    * path matters at scale: ASCII and already-composed text (the vast
    * majority of a crawl) returns WITHOUT allocating.
    */
  def nfcU(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
}
