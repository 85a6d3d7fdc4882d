package graft

import graft.fixtures.ImageGen
import graft.validate.ImageValidate
import java.awt.image.BufferedImage
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** r6 optimization pins: the direct-raster pixel paths (ImageGen.raster /
  * texturedRaster / phashOf, ImageValidate.packedRgb / psnr) must be
  * BIT-identical to the per-pixel getRGB/setRGB forms they replaced — these
  * run inside the frozen Bench frontier round, so any drift would silently
  * change what the driver measures/validates.
  */
class ImagePixelPathSpec extends AnyFunSpec with Matchers {

  private val seeds = Seq(0L, 1L, 2L, 3L, 5L, 17L, 255L, 4095L, 123456789L)

  /** The pre-r6 reference raster: per-pixel setRGB, same math. */
  private def referenceRaster(i: Long): BufferedImage = {
    import graft.functions.GraftHash.mix64
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    val w = 32 + (java.lang.Math.floorMod(mix64(i, 1L), 4L) * 32).toInt
    val h = 32 + (java.lang.Math.floorMod(mix64(i, 2L), 4L) * 32).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val base = mix64(i, 3L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val n = mix64(base, (y.toLong << 20) | x.toLong)
        def noise(sh: Int): Int = (((n >>> sh) & 0x7) - 4).toInt
        val r = clamp((x * 255) / w + noise(0))
        val g = clamp((y * 255) / h + noise(8))
        val b = clamp(((x + y) * 255) / (w + h) + noise(16))
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** The pre-r6 reference textured raster: per-pixel sin sums via getRGB. */
  private def referenceTextured(i: Long): BufferedImage = {
    import graft.functions.GraftHash.mix64
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    val img = referenceRaster(i)
    val (w, h) = (img.getWidth, img.getHeight)
    val comps = (0 until 10).map { k =>
      val s = mix64(i, 7L + k)
      (1.0 + java.lang.Math.floorMod(s, 8L),
        1.0 + java.lang.Math.floorMod(s >>> 8, 8L),
        java.lang.Math.floorMod(s >>> 16, 628L) / 100.0,
        java.lang.Math.floorMod(s >>> 24, 628L) / 100.0,
        30.0 / math.sqrt(k + 1.0))
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var t = 0.0
        comps.foreach { case (fx, fy, p1, p2, a) =>
          t += a * math.sin(2 * math.Pi * fx * x / w + p1) *
            math.sin(2 * math.Pi * fy * y / h + p2)
        }
        val p = img.getRGB(x, y)
        val r = clamp((((p >> 16) & 0xff) + t).toInt)
        val g = clamp((((p >> 8) & 0xff) + t).toInt)
        val b = clamp(((p & 0xff) + t).toInt)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** The pre-r6 reference PSNR: per-pixel getRGB, channels B,G,R. */
  private def referencePsnr(a: BufferedImage, b: BufferedImage): Double = {
    var se = 0.0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var sh = 0
        while (sh <= 16) {
          val d = ((pa >> sh) & 0xff) - ((pb >> sh) & 0xff)
          se += d.toDouble * d
          sh += 8
        }
        x += 1
      }
      y += 1
    }
    val mse = se / (a.getWidth.toDouble * a.getHeight * 3)
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  private def pixelsEqual(a: BufferedImage, b: BufferedImage): Unit = {
    a.getWidth shouldBe b.getWidth
    a.getHeight shouldBe b.getHeight
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        withClue(s"($x,$y): ") { a.getRGB(x, y) shouldBe b.getRGB(x, y) }
        x += 1
      }
      y += 1
    }
  }

  it("raster: direct-buffer path is pixel-identical to setRGB path") {
    seeds.foreach(i => pixelsEqual(ImageGen.raster(i), referenceRaster(i)))
  }

  it("texturedRaster: separable-table path is pixel-identical to per-pixel path") {
    seeds.foreach(i => pixelsEqual(ImageGen.texturedRaster(i), referenceTextured(i)))
  }

  it("packedRgb matches getRGB masked to 24 bits on generated AND decoded images") {
    seeds.foreach { i =>
      val src = ImageGen.raster(i)
      for (img <- Seq(src,
          ImageValidate.decode(ImageGen.encode(src, "png")),
          ImageValidate.decode(ImageGen.encode(src, "jpeg")))) {
        val packed = ImageValidate.packedRgb(img)
        var y = 0; var k = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            (packed(k) & 0xffffff) shouldBe (img.getRGB(x, y) & 0xffffff)
            k += 1; x += 1
          }
          y += 1
        }
      }
    }
  }

  it("psnr: packed path is BIT-identical (same accumulation order) to getRGB path") {
    seeds.foreach { i =>
      val src = ImageGen.raster(i)
      val png = ImageValidate.decode(ImageGen.encode(src, "png"))
      val jpg = ImageValidate.decode(ImageGen.encode(src, "jpeg"))
      ImageValidate.psnr(src, png) shouldBe referencePsnr(src, png)
      // exact double equality — the frozen Bench gates on >= 40.0 dB
      val fast = ImageValidate.psnr(src, jpg)
      val ref = referencePsnr(src, jpg)
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref), s"psnr drifted: $fast vs $ref")
    }
  }

  it("phashOf: fast path equals per-pixel hash on generated and textured rasters") {
    // reference = the fallback branch: force it by wrapping in a copy of a
    // different image type (TYPE_INT_ARGB keeps RGB lossless)
    def viaFallback(img: BufferedImage): Long = {
      val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_ARGB)
      val g = c.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
      ImageGen.phashOf(c)
    }
    seeds.foreach { i =>
      ImageGen.phashOf(ImageGen.raster(i)) shouldBe viaFallback(ImageGen.raster(i))
      ImageGen.phashOf(ImageGen.texturedRaster(i)) shouldBe viaFallback(ImageGen.texturedRaster(i))
    }
  }
}
