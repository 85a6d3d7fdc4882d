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
}
