package graft.validate

import graft.fixtures.ImageGen
import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Payload round-trip validation — the per-row invariant from
  * BASELINE.json input_hint: decoded pixels allclose vs the source raster
  * (exact for lossless, PSNR ≥ 40 dB for lossy) plus exact caption equality.
  *
  * Decode runs in `mapPartitions` (SURVEY.md §2.10: heavyweight, non-codegen
  * by design — it's a byte-blob codec, not an expression), one task per
  * partition of the images table; nothing is collected to the driver.
  */
object ImageValidate {

  // see ImageGen: avoid file-backed imageio cache streams in executors
  ImageIO.setUseCache(false)

  val PsnrGateDb = 40.0

  final case class Verdict(
      image_id: String, fmt: String, psnr_db: Double,
      pixels_ok: Boolean, caption_ok: Boolean, phash_ok: Boolean)

  // r6 (guide §4.5): `ImageIO.read` walks the service registry per call
  // (each provider's canDecodeInput re-reads the magic bytes) and
  // constructs a fresh reader per image. The decode itself — the "real
  // fetched-payload work" the bench round models — is UNCHANGED: the same
  // JDK PNGImageReader / JPEGImageReader instances do the actual decoding;
  // only the per-call lookup is hoisted to one cached reader per thread,
  // dispatched on the container magic we generate (PNG \x89PNG, JPEG
  // \xFF\xD8). Anything else falls back to the stock ImageIO.read path.
  // Byte-path equivalence is pinned by ImageCodecCacheSpec.
  private val readerFor = new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
    override def initialValue() = new java.util.HashMap[String, javax.imageio.ImageReader]()
  }
  private def cachedReader(fmt: String): javax.imageio.ImageReader = {
    val m = readerFor.get()
    var r = m.get(fmt)
    if (r == null) {
      r = ImageIO.getImageReadersByFormatName(fmt).next()
      m.put(fmt, r)
    }
    r
  }

  /** Minimal seekable ImageInputStream straight over a byte[] —
    * MemoryCacheImageInputStream re-buffers the (already in-memory) bytes
    * into its block cache per image; this reads the array directly. Only
    * read()/read(b,off,len)/length are format-relevant; seeking is the
    * ImageInputStreamImpl streamPos contract.
    */
  private final class ByteArrayImageInputStream(bytes: Array[Byte])
      extends javax.imageio.stream.ImageInputStreamImpl {
    override def read(): Int = {
      if (streamPos >= bytes.length) return -1
      bitOffset = 0
      val v = bytes(streamPos.toInt) & 0xff
      streamPos += 1
      v
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (streamPos >= bytes.length) return -1
      bitOffset = 0
      val n = math.min(len, bytes.length - streamPos.toInt)
      System.arraycopy(bytes, streamPos.toInt, b, off, n)
      streamPos += n
      n
    }
    override def length(): Long = bytes.length.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
  }

  def decode(bytes: Array[Byte]): BufferedImage = {
    val fmt =
      if (bytes.length > 3 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte) "png"
      else if (bytes.length > 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
      else null
    if (fmt == null) return ImageIO.read(new ByteArrayInputStream(bytes))
    val reader = cachedReader(fmt)
    val iis = new ByteArrayImageInputStream(bytes)
    reader.setInput(iis, true, true)
    try reader.read(0)
    finally { reader.setInput(null); iis.close() }
  }

  /** Row-major packed-RGB pixels of an image, reading the backing raster
    * directly for the two layouts this pipeline actually produces
    * (TYPE_INT_RGB from the generator, TYPE_3BYTE_BGR from the JDK
    * PNG/JPEG readers) and falling back to per-pixel `getRGB` for anything
    * else. Only the low 24 bits are meaningful — identical to what the
    * per-pixel `getRGB` path yields under the `& 0xff` channel masks
    * (pinned by ImagePixelPathSpec). Callers must treat the returned array
    * as read-only: for TYPE_INT_RGB it IS the image's backing buffer.
    */
  private[graft] def packedRgb(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    img.getType match {
      case BufferedImage.TYPE_INT_RGB
          if raster.getDataBuffer.getOffset == 0 &&
            raster.getSampleModel.isInstanceOf[java.awt.image.SinglePixelPackedSampleModel] &&
            raster.getSampleModel.asInstanceOf[java.awt.image.SinglePixelPackedSampleModel]
              .getScanlineStride == w =>
        raster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData
      case BufferedImage.TYPE_3BYTE_BGR
          if raster.getDataBuffer.getOffset == 0 &&
            raster.getSampleModel.isInstanceOf[java.awt.image.PixelInterleavedSampleModel] &&
            raster.getSampleModel.asInstanceOf[java.awt.image.PixelInterleavedSampleModel]
              .getPixelStride == 3 =>
        val sm = raster.getSampleModel.asInstanceOf[java.awt.image.PixelInterleavedSampleModel]
        val ss = sm.getScanlineStride
        val db = raster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
        val out = new Array[Int](w * h)
        var y = 0; var k = 0
        while (y < h) {
          var o = y * ss
          var x = 0
          while (x < w) {
            // TYPE_3BYTE_BGR band offsets: B at +0, G at +1, R at +2
            out(k) = ((db(o + 2) & 0xff) << 16) | ((db(o + 1) & 0xff) << 8) | (db(o) & 0xff)
            k += 1; o += 3; x += 1
          }
          y += 1
        }
        out
      case _ =>
        val out = new Array[Int](w * h)
        var y = 0; var k = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(k) = img.getRGB(x, y); k += 1; x += 1 }
          y += 1
        }
        out
    }
  }

  /** PSNR (dB) between two same-sized RGB images over all channels.
    * Infinity when identical (MSE = 0): PSNR = 10·log10(255² / MSE).
    *
    * r6: pixels come from [[packedRgb]] (one bulk raster read per image)
    * instead of two `getRGB` ColorModel round-trips per pixel; the
    * accumulation order (row-major, channels B,G,R per pixel) is unchanged,
    * so `se` — and the returned dB — are bit-identical.
    */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    // r6: the dominant case (generator INT_RGB vs decoder 3BYTE_BGR) walks
    // both backing buffers directly instead of materializing packedRgb(b)
    // — SAME traversal (row-major pixels, channels B,G,R within each) and
    // the identical `se += d*d` adds in the identical order, so the sum —
    // and the returned dB — are bit-identical to the two-pass form
    // (ImageCodecCacheSpec pins fused ≡ two-pass on a seed sweep).
    val w = a.getWidth; val h = a.getHeight
    var se = 0.0
    val fastA: Array[Int] =
      if (a.getType == BufferedImage.TYPE_INT_RGB) intRgbDirect(a) else null
    val fastB: Array[Byte] =
      if (b.getType == BufferedImage.TYPE_3BYTE_BGR) bgrDirect(b) else null
    if (fastA != null && fastB != null) {
      val n = w * h
      var i = 0
      var o = 0
      while (i < n) {
        val x = fastA(i)
        val dB = (x & 0xff) - (fastB(o) & 0xff)
        se += dB.toDouble * dB
        val dG = ((x >> 8) & 0xff) - (fastB(o + 1) & 0xff)
        se += dG.toDouble * dG
        val dR = ((x >> 16) & 0xff) - (fastB(o + 2) & 0xff)
        se += dR.toDouble * dR
        i += 1; o += 3
      }
    } else {
      val pa = packedRgb(a); val pb = packedRgb(b)
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
    }
    val mse = se / (w.toDouble * h * 3)
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** The INT_RGB backing buffer iff it is laid out exactly row-major with
    * no offset/stride surprises (the [[packedRgb]] fast-path conditions);
    * null otherwise.
    */
  private def intRgbDirect(img: BufferedImage): Array[Int] = {
    val raster = img.getRaster
    raster.getSampleModel match {
      case sm: java.awt.image.SinglePixelPackedSampleModel
          if raster.getDataBuffer.getOffset == 0 &&
            sm.getScanlineStride == img.getWidth =>
        raster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData
      case _ => null
    }
  }

  /** The 3BYTE_BGR backing buffer iff pixel stride 3, scanline stride w*3,
    * offset 0 (contiguous row-major B,G,R); null otherwise.
    */
  private def bgrDirect(img: BufferedImage): Array[Byte] = {
    val raster = img.getRaster
    raster.getSampleModel match {
      case sm: java.awt.image.PixelInterleavedSampleModel
          if raster.getDataBuffer.getOffset == 0 &&
            sm.getPixelStride == 3 &&
            sm.getScanlineStride == img.getWidth * 3 =>
        raster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
      case _ => null
    }
  }

  /** Validate every row of an images table (schema = input_hint) against the
    * regenerated source raster + caption. `image_id` must parse back to the
    * generator index (img%010d) — for foreign tables, pass a custom oracle.
    */
  def validate(spark: SparkSession, images: DataFrame): Dataset[Verdict] = {
    import spark.implicits._
    images
      .select("image_id", "bytes", "fmt", "caption", "phash")
      .as[(String, Array[Byte], String, String, Long)]
      .mapPartitions(_.map { case (id, bytes, fmt, caption, phash) =>
        val i = id.stripPrefix("img").toLong
        val expected = ImageGen.raster(i)
        val got = decode(bytes)
        val p = psnr(expected, got)
        val pixelsOk =
          if (fmt == "png") p.isPosInfinity // lossless → exact
          else p >= PsnrGateDb              // lossy → PSNR gate
        Verdict(id, fmt, p, pixelsOk,
          caption_ok = caption == ImageGen.captionOf(i),
          phash_ok = phash == ImageGen.phashOf(expected))
      })
  }

  /** Summary row: (rows, pixel_failures, caption_failures, min_psnr_lossy). */
  def summarize(v: Dataset[Verdict]): (Long, Long, Long, Double) = {
    import org.apache.spark.sql.functions._
    val r = v.toDF().agg(
      count(lit(1)),
      sum(when(!col("pixels_ok"), 1L).otherwise(0L)),
      sum(when(!col("caption_ok"), 1L).otherwise(0L)),
      min(when(col("fmt") === "jpeg", col("psnr_db")))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) Double.NaN else r.getDouble(3))
  }
}
