package graft.fixtures

import graft.validate.ImageValidate
import java.awt.image.BufferedImage
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** r6 pins for the fast PNG encoder: the frozen Bench frontier round gates
  * `psnr == ∞` on the PNG branch, so the encoder must round-trip EXACT
  * pixels through the real JDK decoder; the multimodal queries additionally
  * read dims from the decode. Both are pinned against the ImageIO-encoded
  * reference.
  */
class PngCodecSpec extends AnyFunSpec with Matchers {

  private val seeds = Seq(0L, 1L, 2L, 3L, 7L, 63L, 255L, 4095L, 987654321L)

  private def imageioPng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  it("JDK ImageIO decodes PngCodec output to bit-identical pixels (PSNR = ∞)") {
    seeds.foreach { i =>
      val img = ImageGen.raster(i)
      val decoded = ImageValidate.decode(PngCodec.encode(img))
      decoded.getWidth shouldBe img.getWidth
      decoded.getHeight shouldBe img.getHeight
      ImageValidate.psnr(img, decoded).isPosInfinity shouldBe true
    }
  }

  it("decodes identically to the ImageIO-encoded reference bytes") {
    seeds.foreach { i =>
      val img = ImageGen.texturedRaster(i)
      val a = ImageValidate.decode(PngCodec.encode(img))
      val b = ImageValidate.decode(imageioPng(img))
      a.getWidth shouldBe b.getWidth
      a.getHeight shouldBe b.getHeight
      var y = 0
      while (y < a.getHeight) {
        var x = 0
        while (x < a.getWidth) {
          (a.getRGB(x, y) & 0xffffff) shouldBe (b.getRGB(x, y) & 0xffffff)
          x += 1
        }
        y += 1
      }
    }
  }

  it("ImageGen.encode routes INT_RGB png through PngCodec (signature + lossless)") {
    val img = ImageGen.raster(42L)
    val bytes = ImageGen.encode(img, "png")
    // PNG signature
    (bytes.take(8).map(_ & 0xff) sameElements
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)) shouldBe true
    ImageValidate.psnr(img, ImageValidate.decode(bytes)).isPosInfinity shouldBe true
  }

  it("1x1 and extreme-color images round-trip") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1), (32, 128))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var k = 0
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      while (k < w * h) {
        data(k) = Seq(0x000000, 0xffffff, 0xff0000, 0x00ff00, 0x0000ff)(k % 5)
        k += 1
      }
      val decoded = ImageValidate.decode(PngCodec.encode(img))
      ImageValidate.psnr(img, decoded).isPosInfinity shouldBe true
    }
  }
}
