package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven contract tests mirroring the reference's lenient/strict hex
  * semantics (SURVEY.md §2.8 U1–U7, FIXTURES.md §5).
  */
class HexCodecSpec extends AnyFunSuite {

  test("U1 lenient decode: zero-on-error contract") {
    val cases = Seq(
      "0x0" -> 0L, "" -> 0L, "0" -> 0L, "0x" -> 0L,
      "0x1" -> 1L, "0xff" -> 255L, "0xFF" -> 255L, "ff" -> 255L,
      "0x10" -> 16L, "zz" -> 0L, "0xzz" -> 0L, "0x12g4" -> 0L,
      "0x11db4a16a2" -> 76693509794L,
      "0xffffffffffffffff" -> -1L, // uint64 max, reinterpreted signed
      "0x10000000000000000" -> 0L, // >64-bit → 0
      "0x0000000000000001" -> 1L)
    cases.foreach { case (in, want) =>
      assert(HexCodec.decodeHexLenient(in) === want, s"input=$in")
    }
    assert(HexCodec.decodeHexLenient(null) === 0L)
  }

  test("U1 round-trips sampled unsigned-63-bit longs") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextLong() & Long.MaxValue
      assert(HexCodec.decodeHexLenient(HexCodec.encodeUint64(n)) === n)
    }
  }

  test("U2 value decode: 256-bit decimal strings") {
    assert(HexCodec.decodeValueHex("0x0") === "0")
    assert(HexCodec.decodeValueHex("") === "0")
    assert(HexCodec.decodeValueHex("x") === "0")
    assert(HexCodec.decodeValueHex("0xde0b6b3a7640000") === "1000000000000000000")
    assert(HexCodec.decodeValueHex("de0b6b3a7640000") === "1000000000000000000")
    // 2^256 - 1 (exceeds DecimalType(38); stays a string — SURVEY.md §1.2)
    val max256 = "0x" + "f" * 64
    assert(HexCodec.decodeValueHex(max256) ===
      "115792089237316195423570985008687907853269984665640564039457584007913129639935")
    assert(HexCodec.decodeValueHex("0xnope") === "0")
  }

  test("U3 minimal encode") {
    assert(HexCodec.encodeUint64(0L) === "0x0")
    assert(HexCodec.encodeUint64(255L) === "0xff")
    assert(HexCodec.encodeUint64(76693509794L) === "0x11db4a16a2")
  }

  test("U4 strict byte decode errors") {
    assert(HexCodec.decodeBytes("").isLeft)
    assert(HexCodec.decodeBytes("ff").isLeft)      // no prefix
    assert(HexCodec.decodeBytes("0xf").isLeft)     // odd length
    assert(HexCodec.decodeBytes("0x0102").map(_.toSeq) === Right(Seq[Byte](1, 2)))
    assert(HexCodec.encodeBytes(Array[Byte](1, 2)) === "0x0102")
  }

  test("U5 strict decode: leading-zero rejection, 64-bit cap") {
    assert(HexCodec.decodeHexStrict("0x0") === Some(0L))
    assert(HexCodec.decodeHexStrict("0x01") === None)
    assert(HexCodec.decodeHexStrict("0x1") === Some(1L))
    assert(HexCodec.decodeHexStrict("1") === None)
    assert(HexCodec.decodeHexStrict("0x" + "f" * 17) === None)
  }

  test("U5 strict DecodeBig: the reference's exact error table (hexutil.go:121-160,176-191)") {
    val errs = Seq(
      "" -> "empty hex string",
      "ff" -> "hex string without 0x prefix",
      "1" -> "hex string without 0x prefix",
      "0x" -> "hex string \"0x\"",
      "0x01" -> "hex number with leading zero digits",
      "0x0000000000000001" -> "hex number with leading zero digits",
      ("0x" + "1" * 65) -> "hex number > 256 bits",
      "0xzz" -> "invalid hex string",
      "0x12g4" -> "invalid hex string")
    errs.foreach { case (in, want) =>
      assert(HexCodec.decodeBigStrict(in) === Left(want), s"input=$in")
    }
    assert(HexCodec.decodeBigStrict(null) === Left("empty hex string"))
    // accepted values, including the full 256-bit range and 0X prefix
    assert(HexCodec.decodeBigStrict("0x0") === Right(BigInt(0)))
    assert(HexCodec.decodeBigStrict("0X1") === Right(BigInt(1)))
    assert(HexCodec.decodeBigStrict("0xde0b6b3a7640000") ===
      Right(BigInt("1000000000000000000")))
    assert(HexCodec.decodeBigStrict("0x" + "f" * 64) === Right(
      BigInt("115792089237316195423570985008687907853269984665640564039457584007913129639935")))
  }

  test("U5 strict DecodeUint64: checkNumber syntax + 64-bit cap") {
    assert(HexCodec.decodeUint64Strict("0x0") === Right(0L))
    assert(HexCodec.decodeUint64Strict("0xffffffffffffffff") === Right(-1L))
    assert(HexCodec.decodeUint64Strict("0x" + "1" * 17) === Left("hex number > 64 bits"))
    assert(HexCodec.decodeUint64Strict("0x01") === Left("hex number with leading zero digits"))
    assert(HexCodec.decodeUint64Strict("ff") === Left("hex string without 0x prefix"))
    assert(HexCodec.decodeUint64Strict("0x") === Left("hex string \"0x\""))
    assert(HexCodec.decodeUint64Strict("") === Left("empty hex string"))
  }

  test("U8 FloatToString: fixed 8 decimal places (util.go:28-32)") {
    assert(HexCodec.floatToString(0.0) === "0.00000000")
    assert(HexCodec.floatToString(1.0) === "1.00000000")
    assert(HexCodec.floatToString(1.5) === "1.50000000")
    assert(HexCodec.floatToString(3.141592653589793) === "3.14159265")
    assert(HexCodec.floatToString(-1.25) === "-1.25000000")
    assert(HexCodec.floatToString(123456.123456789) === "123456.12345679")
  }

  test("U8 BigFloatToString: 2-dp min padding, prec truncation (util.go:34-51)") {
    assert(HexCodec.bigFloatToString("42", 8) === "42.00")
    assert(HexCodec.bigFloatToString("42.5", 8) === "42.50")
    assert(HexCodec.bigFloatToString("42.123456789012", 8) === "42.12345678") // truncate, not round
    assert(HexCodec.bigFloatToString("42.1299", 2) === "42.12")
    assert(HexCodec.bigFloatToString("-1.05", 8) === "-1.05")
  }

  test("U6 ABI word to address") {
    val word = "0x" + "0" * 24 + "AbCdEf0123456789aBcDeF0123456789AbCdEf01"
    assert(HexCodec.inputParamsToAddress(word) ===
      "0xabcdef0123456789abcdef0123456789abcdef01")
  }

  test("U7 fromWei") {
    assert(HexCodec.fromWei("1000000000000000000") === "1")
    assert(HexCodec.fromWei("1500000000000000000") === "1.5")
    assert(HexCodec.fromWeiToGwei("1000000000") === "1")
  }
}
