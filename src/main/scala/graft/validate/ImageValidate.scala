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

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** PSNR (dB) between two same-sized RGB images over all channels.
    * Infinity when identical (MSE = 0): PSNR = 10·log10(255² / MSE).
    */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
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
