package graft.fixtures

import java.awt.image.BufferedImage
import java.util.zip.{CRC32, Deflater}

/** Minimal spec-compliant PNG encoder for TYPE_INT_RGB rasters — the r6
  * replacement for `ImageIO.write(img, "png", ...)` in the synthetic-page
  * generator (guide §1.2 step 2: the frontier round's dominant per-row cost
  * was the JDK PNG writer, measured 565 µs/img — hardcoded best-compression
  * deflate plus per-scanline adaptive filtering, neither of which the
  * LOSSLESS round-trip contract needs).
  *
  * Output: 8-bit truecolor (color type 2), no interlace, filter None on
  * every scanline, one zlib stream at `level` (default 0). Level 0 is not a
  * quality compromise on THIS payload: the generator's per-pixel noise
  * makes the scanlines incompressible — measured 3104 B → 3115 B at level
  * 9 (DriveImagePerf `deflate_lvl*`), i.e. deflate gains 0% at every
  * level while costing 30 µs (level 1-9) vs 3.5 µs (level 0) per image.
  * The bytes differ from ImageIO's (different filter/level choices of the
  * same format, near-identical SIZE because neither can compress noise)
  * but decode to BIT-identical pixels through the same JDK ImageIO
  * reader — the invariant the frozen Bench validates (PSNR = ∞ on the PNG
  * branch) and PngCodecSpec pins. The DECODE side of the round trip — the
  * part that models real fetched-payload work — remains the real JDK
  * codec.
  */
object PngCodec {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Encode a TYPE_INT_RGB image (other types fall back to the caller's
    * ImageIO path — see [[ImageGen.encode]]).
    */
  def encode(img: BufferedImage, level: Int = 0): Array[Byte] = {
    require(img.getType == BufferedImage.TYPE_INT_RGB,
      s"PngCodec handles TYPE_INT_RGB only, got ${img.getType}")
    val w = img.getWidth; val h = img.getHeight
    val pixels = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData

    // raw scanlines: 1 filter byte (None) + w*3 RGB bytes per row
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0; var o = 0
    while (y < h) {
      raw(o) = 0 // filter: None
      o += 1
      var x = 0
      val row = y * w
      while (x < w) {
        val p = pixels(row + x)
        raw(o) = ((p >> 16) & 0xff).toByte
        raw(o + 1) = ((p >> 8) & 0xff).toByte
        raw(o + 2) = (p & 0xff).toByte
        o += 3; x += 1
      }
      y += 1
    }

    val deflater = new Deflater(level)
    deflater.setInput(raw)
    deflater.finish()
    val zbuf = new Array[Byte](raw.length + (raw.length >> 9) + 64)
    var zn = 0
    while (!deflater.finished()) {
      if (zn == zbuf.length) throw new IllegalStateException("deflate overflow")
      zn += deflater.deflate(zbuf, zn, zbuf.length - zn)
    }
    deflater.end()

    val out = new java.io.ByteArrayOutputStream(zn + 64)
    out.write(Signature, 0, Signature.length)

    val ihdr = new Array[Byte](13)
    putInt(ihdr, 0, w); putInt(ihdr, 4, h)
    ihdr(8) = 8  // bit depth
    ihdr(9) = 2  // color type: truecolor
    // compression 0, filter 0, interlace 0 already zero
    writeChunk(out, "IHDR", ihdr, 13)
    writeChunk(out, "IDAT", zbuf, zn)
    writeChunk(out, "IEND", Array.emptyByteArray, 0)
    out.toByteArray
  }

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte], len: Int): Unit = {
    val hdr = new Array[Byte](8)
    putInt(hdr, 0, len)
    var i = 0
    while (i < 4) { hdr(4 + i) = typ.charAt(i).toByte; i += 1 }
    out.write(hdr, 0, 8)
    out.write(data, 0, len)
    val crc = new CRC32()
    crc.update(hdr, 4, 4)
    crc.update(data, 0, len)
    val tail = new Array[Byte](4)
    putInt(tail, 0, crc.getValue.toInt)
    out.write(tail, 0, 4)
  }
}
