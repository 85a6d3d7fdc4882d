package graft.validate

import graft.fixtures.{ImageGen, PngCodec}
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import org.scalatest.funsuite.AnyFunSuite

/** r6: the per-row codec hot path caches JDK reader/writer instances per
  * thread and reuses PngCodec scratch buffers. This spec pins that the
  * cached paths are BYTE-identical (encode) and PIXEL-identical (decode)
  * to the uncached per-call JDK paths, across repeated use of the same
  * thread-local instances (state leakage between images would show here).
  */
class ImageCodecCacheSpec extends AnyFunSuite {

  /** The pre-r6 per-call JPEG encode: fresh registry lookup + writer. */
  private def jpegFresh(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(ImageGen.JpegQuality)
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("cached jpeg writer emits byte-identical streams across reuse") {
    (0L until 40L).foreach { i =>
      val img = ImageGen.raster(i)
      val cached = ImageGen.encode(img, "jpeg")
      assert(java.util.Arrays.equals(cached, jpegFresh(img)), s"img $i")
    }
  }

  test("cached readers decode to the same pixels as ImageIO.read") {
    (0L until 40L).foreach { i =>
      val img = ImageGen.raster(i)
      Seq("png", "jpeg").foreach { fmt =>
        val bytes = ImageGen.encode(img, fmt)
        val cached = ImageValidate.decode(bytes)
        val stock = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        assert(cached.getWidth === stock.getWidth && cached.getHeight === stock.getHeight)
        assert(cached.getType === stock.getType, s"$fmt $i reader type")
        assert(ImageValidate.packedRgb(cached).toSeq === ImageValidate.packedRgb(stock).toSeq,
          s"$fmt $i pixels")
      }
    }
  }

  test("png scratch reuse is deterministic: same image twice, same bytes") {
    (0L until 20L).foreach { i =>
      val img = ImageGen.raster(i)
      val a = PngCodec.encode(img)
      // interleave a different-sized image to dirty the scratch buffers
      PngCodec.encode(ImageGen.raster(i + 1))
      val b = PngCodec.encode(img)
      assert(java.util.Arrays.equals(a, b), s"img $i")
    }
  }

  test("non-magic bytes still fall back to stock ImageIO.read (null)") {
    assert(ImageValidate.decode(Array[Byte](1, 2, 3, 4)) === null)
  }

  test("fused psnr ≡ two-pass packedRgb psnr, bit for bit") {
    // the two-pass reference: exactly the pre-r6 formulation
    def psnrRef(a: java.awt.image.BufferedImage,
        b: java.awt.image.BufferedImage): Double = {
      val pa = ImageValidate.packedRgb(a); val pb = ImageValidate.packedRgb(b)
      var se = 0.0
      var i = 0
      while (i < pa.length) {
        val x = pa(i); val y = pb(i)
        var sh = 0
        while (sh <= 16) {
          val d = ((x >> sh) & 0xff) - ((y >> sh) & 0xff)
          se += d.toDouble * d
          sh += 8
        }
        i += 1
      }
      val mse = se / (a.getWidth.toDouble * a.getHeight * 3)
      if (mse == 0.0) Double.PositiveInfinity
      else 10.0 * math.log10(255.0 * 255.0 / mse)
    }
    (0L until 40L).foreach { i =>
      val img = ImageGen.raster(i)
      Seq("png", "jpeg").foreach { fmt =>
        val dec = ImageValidate.decode(ImageGen.encode(img, fmt))
        val fused = ImageValidate.psnr(img, dec) // INT_RGB vs 3BYTE_BGR fast path
        val ref = psnrRef(img, dec)
        assert(java.lang.Double.doubleToRawLongBits(fused) ===
          java.lang.Double.doubleToRawLongBits(ref), s"$fmt $i")
      }
    }
  }
}
