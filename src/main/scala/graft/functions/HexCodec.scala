package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Hex-quantity codecs with the reference's exact lenient/strict contracts.
  *
  * Lenient decode (zero-on-error): /root/reference/util/util.go:53-74.
  * Value decode (256-bit → decimal string): /root/reference/util/util.go:76-97.
  * Minimal encode: /root/reference/util/hexutil.go:98-103.
  * Strict decode (reject empty/no-prefix/odd/leading-zero, 64-bit cap):
  * /root/reference/util/hexutil.go:44-96.
  * ABI word → address: /root/reference/util/util.go:99-101.
  * Wei conversions: /root/reference/util/util.go:103-115.
  *
  * All hot-path variants have UTF8String overloads so the Catalyst
  * expressions in [[GraftExpressions]] can call them from generated code
  * (static forwarders) without String materialization.
  */
object HexCodec {

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  /** Lenient 0x-hex → unsigned-64 (as signed Long bit pattern).
    * Contract (zero-on-error, never throws):
    * len<2 → 0; "0x0" → 0; strip optional "0x"; any non-hex char → 0;
    * more than 16 hex digits (>64-bit) → 0. A non-prefixed hex string is
    * still parsed as hex (matches the reference's prefix-strip-then-parse).
    * Note the reference parses into uint64; values ≥ 2^63 come back as the
    * same 64 bits reinterpreted signed (documented; heights/gas never hit it).
    */
  def decodeHexLenient(str: String): Long = {
    if (str == null || str.length < 2) return 0L
    var s = str
    if (s.charAt(0) == '0' && (s.charAt(1) == 'x' || s.charAt(1) == 'X'))
      s = s.substring(2)
    val n = s.length
    if (n == 0 || n > 16) return 0L
    var acc = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (!isHexDigit(c)) return 0L
      acc = (acc << 4) | hexVal(c)
      i += 1
    }
    acc
  }

  def decodeHexLenientU(s: UTF8String): Long =
    if (s == null) 0L else decodeHexLenient(s.toString)

  /** Lenient 0x-hex (≤256-bit in practice, unbounded here) → decimal string.
    * len<2 or "0x0" → "0"; malformed → "0" (the reference logs and would
    * NPE-print "<nil>"; we implement the evident intent — SURVEY.md §2.8 U2).
    */
  def decodeValueHex(str: String): String = {
    if (str == null || str.length < 2 || str == "0x0") return "0"
    val s =
      if (str.charAt(0) == '0' && (str.charAt(1) == 'x' || str.charAt(1) == 'X'))
        str.substring(2)
      else str
    if (s.isEmpty || !s.forall(isHexDigit)) return "0"
    new java.math.BigInteger(s, 16).toString
  }

  def decodeValueHexU(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(decodeValueHex(s.toString))

  /** uint64 → minimal "0x"-prefixed lower-hex (no leading zeros; 0 → "0x0"). */
  def encodeUint64(n: Long): String = "0x" + java.lang.Long.toHexString(n)

  def encodeUint64U(n: Long): UTF8String = UTF8String.fromString(encodeUint64(n))

  /** Strict 0x-hex → Long; null (None) on: missing prefix, empty digits,
    * leading zero (except exactly "0x0"), non-hex char, >16 digits.
    */
  def decodeHexStrict(str: String): Option[Long] = {
    if (str == null || str.length < 3) return if (str == "0x0") Some(0L) else None
    if (!(str.charAt(0) == '0' && str.charAt(1) == 'x')) return None
    val s = str.substring(2)
    if (s.length > 16) return None
    if (s.length > 1 && s.charAt(0) == '0') return None
    if (!s.forall(isHexDigit)) return None
    var acc = 0L
    s.foreach(c => acc = (acc << 4) | hexVal(c))
    Some(acc)
  }

  /** Strict quantity syntax check — the exact error table of the
    * reference's checkNumber (/root/reference/util/hexutil.go:176-191):
    * empty → "empty hex string"; no 0x/0X prefix → "hex string without 0x
    * prefix"; bare "0x" → "hex string \"0x\""; leading zero digit (length>1)
    * → "hex number with leading zero digits". Returns the raw digits.
    */
  private def checkNumber(str: String): Either[String, String] = {
    if (str == null || str.isEmpty) Left("empty hex string")
    else if (!(str.length >= 2 && str.charAt(0) == '0' &&
        (str.charAt(1) == 'x' || str.charAt(1) == 'X')))
      Left("hex string without 0x prefix")
    else {
      val s = str.substring(2)
      if (s.isEmpty) Left("hex string \"0x\"")
      else if (s.length > 1 && s.charAt(0) == '0')
        Left("hex number with leading zero digits")
      else Right(s)
    }
  }

  /** Strict 0x-hex quantity → BigInt, capped at 256 bits — the reference's
    * DecodeBig (/root/reference/util/hexutil.go:121-150): checkNumber
    * syntax, then ">64 digits" → "hex number > 256 bits", then any non-hex
    * digit → "invalid hex string".
    */
  def decodeBigStrict(str: String): Either[String, BigInt] =
    checkNumber(str).flatMap { s =>
      if (s.length > 64) Left("hex number > 256 bits")
      else if (!s.forall(isHexDigit)) Left("invalid hex string")
      else Right(BigInt(new java.math.BigInteger(s, 16)))
    }

  /** Strict 0x-hex quantity → uint64 (as signed bit pattern) — the
    * reference's DecodeUint64 (/root/reference/util/hexutil.go:76-86):
    * checkNumber syntax, then 16-digit cap → "hex number > 64 bits".
    */
  def decodeUint64Strict(str: String): Either[String, Long] =
    checkNumber(str).flatMap { s =>
      if (s.length > 16) Left("hex number > 64 bits")
      else if (!s.forall(isHexDigit)) Left("invalid hex string")
      else {
        var acc = 0L
        s.foreach(c => acc = (acc << 4) | hexVal(c))
        Right(acc)
      }
    }

  /** Strict 0x-hex → bytes; errors on empty / missing prefix / odd length. */
  def decodeBytes(str: String): Either[String, Array[Byte]] = {
    if (str == null || str.isEmpty) Left("empty hex string")
    else if (str.length < 2 || str.charAt(0) != '0' || str.charAt(1) != 'x')
      Left("hex string without 0x prefix")
    else {
      val s = str.substring(2)
      if (s.length % 2 != 0) Left("hex string of odd length")
      else if (!s.forall(isHexDigit)) Left("invalid hex string")
      else {
        val out = new Array[Byte](s.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((hexVal(s.charAt(2 * i)) << 4) | hexVal(s.charAt(2 * i + 1))).toByte
          i += 1
        }
        Right(out)
      }
    }
  }

  def encodeBytes(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(2 + b.length * 2)
    sb.append("0x")
    b.foreach { x => sb.append(f"${x & 0xff}%02x") }
    sb.toString
  }

  /** 32-byte ABI word (hex string) → "0x" + lowercased last 40 chars. */
  def inputParamsToAddress(str: String): String =
    "0x" + str.substring(26).toLowerCase

  /** Decimal string wei → decimal string ether (÷ 1e18, trailing zeros trimmed). */
  def fromWei(str: String): String = divPow10(str, 18)

  def fromWeiToGwei(str: String): String = divPow10(str, 9)

  private def divPow10(str: String, p: Int): String = {
    val bd = new java.math.BigDecimal(str).movePointLeft(p).stripTrailingZeros()
    bd.toPlainString
  }

  /** Fixed 8-decimal-place formatting — the reference's FloatToString
    * (/root/reference/util/util.go:28-32, strconv.FormatFloat(f,'f',8,64)):
    * round-to-nearest-even on the exact binary value, always 8 fraction
    * digits, no exponent.
    */
  def floatToString(f: Double): String =
    new java.math.BigDecimal(f)
      .setScale(8, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** Display padding/truncation of a decimal string — the reference's
    * BigFloatToString (/root/reference/util/util.go:34-51): no fraction →
    * append ".00"; 1 fraction digit → pad one zero; else TRUNCATE (not
    * round) the fraction to `prec` digits. (The reference slices r[1][:prec]
    * and would panic when 1 < len(frac) < prec; we take min(len, prec) —
    * the evident intent, deviation documented.)
    */
  def bigFloatToString(dec: String, prec: Int): String =
    dec.split('.') match {
      case Array(whole) => whole + ".00"
      case Array(whole, frac) =>
        if (frac.length == 1) whole + "." + frac + "0"
        else whole + "." + frac.take(prec)
      case _ => dec
    }
}
