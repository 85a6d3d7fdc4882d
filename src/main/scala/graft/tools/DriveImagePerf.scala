package graft.tools

import graft.fixtures.ImageGen
import graft.validate.ImageValidate

/** r6 measurement (guide §1): per-image cost breakdown of the frontier
  * fetch+validate stage — raster gen, encode, decode, PSNR — so the
  * optimization targets the dominant term instead of guessing. Pure JVM
  * micro-bench, no Spark session.
  */
object DriveImagePerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val seeds = (0 until n).map(_.toLong * 7919L % 4096L).toArray

    def bench[T](label: String, reps: Int)(f: Long => T): Unit = {
      f(seeds(0)) // warm
      var i = 0; var sink = 0
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) {
        i = 0
        while (i < seeds.length) {
          sink ^= f(seeds(i)).hashCode()
          i += 1
        }
        r += 1
      }
      val us = (System.nanoTime() - t0) / 1e3 / (reps * seeds.length)
      println(f"IMGPERF $label%-22s $us%8.1f us/img  (sink=${sink & 1})")
    }

    bench("raster", 3)(ImageGen.raster)
    bench("texturedRaster", 3)(ImageGen.texturedRaster)
    val imgs = seeds.map(ImageGen.raster)
    val fmts = seeds.map(ImageGen.fmtOf)
    bench("encode", 3)(i => ImageGen.encode(imgs(i.toInt % imgs.length), fmts(i.toInt % imgs.length)))
    // fixed split: encode cost per format
    val pngBytes = seeds.indices.map(k => ImageGen.encode(imgs(k), "png")).toArray
    val jpgBytes = seeds.indices.map(k => ImageGen.encode(imgs(k), "jpeg")).toArray
    bench("encode_png", 3)(i => ImageGen.encode(imgs(i.toInt % imgs.length), "png"))
    bench("encode_jpeg", 3)(i => ImageGen.encode(imgs(i.toInt % imgs.length), "jpeg"))
    bench("decode_png", 3)(i => ImageValidate.decode(pngBytes(i.toInt % imgs.length)))
    bench("decode_jpeg", 3)(i => ImageValidate.decode(jpgBytes(i.toInt % imgs.length)))
    val decodedPng = pngBytes.map(ImageValidate.decode)
    val decodedJpg = jpgBytes.map(ImageValidate.decode)
    println(s"IMGPERF decoded types png=${decodedPng(0).getType} jpeg=${decodedJpg(0).getType}")
    bench("psnr_png", 3)(i => ImageValidate.psnr(imgs(i.toInt % imgs.length), decodedPng(i.toInt % imgs.length)))
    bench("psnr_jpeg", 3)(i => ImageValidate.psnr(imgs(i.toInt % imgs.length), decodedJpg(i.toInt % imgs.length)))
    bench("phash", 3)(i => ImageGen.phashOf(imgs(i.toInt % imgs.length)))

    // deflate-only ceiling: what does java.util.zip cost per level on the
    // raw scanline bytes?
    {
      val img = ImageGen.raster(77L)
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData
      val raw = new Array[Byte](h * (1 + w * 3))
      var y = 0; var o = 0
      while (y < h) {
        raw(o) = 0; o += 1
        var x = 0
        while (x < w) {
          val p = px(y * w + x)
          raw(o) = ((p >> 16) & 0xff).toByte; raw(o + 1) = ((p >> 8) & 0xff).toByte
          raw(o + 2) = (p & 0xff).toByte; o += 3; x += 1
        }
        y += 1
      }
      for (lvl <- Seq(0, 1, 3, 6, 9)) {
        val d = new java.util.zip.Deflater(lvl)
        val zb = new Array[Byte](raw.length * 2 + 64)
        var zn = 0
        val reps = 2000
        // warm
        d.reset(); d.setInput(raw); d.finish(); while (!d.finished()) d.deflate(zb)
        val t0 = System.nanoTime()
        var r = 0
        while (r < reps) {
          d.reset(); d.setInput(raw); d.finish()
          zn = 0
          while (!d.finished()) zn += d.deflate(zb, zn, zb.length - zn)
          r += 1
        }
        val us = (System.nanoTime() - t0) / 1e3 / reps
        println(f"IMGPERF deflate_lvl$lvl (${raw.length} B -> $zn B) $us%8.1f us")
        d.end()
      }
    }

    // full per-row pipeline exactly as Bench.run's fetch_validate does it
    bench("full_validate_row", 3) { i =>
      val img = ImageGen.raster(i)
      val fmt = ImageGen.fmtOf(i)
      val bytes = ImageGen.encode(img, fmt)
      val decoded = ImageValidate.decode(bytes)
      val p = ImageValidate.psnr(img, decoded)
      if (fmt == "png") (if (p.isPosInfinity) 1L else 0L)
      else (if (p >= ImageValidate.PsnrGateDb) 1L else 0L)
    }
  }
}
