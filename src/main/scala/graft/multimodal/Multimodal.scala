package graft.multimodal

import graft.validate.ImageValidate
import java.awt.image.BufferedImage
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise in `mapPartitions` (the Scala
  * analog of `mapInPandas`: one iterator of rows per partition, library
  * calls amortized across the batch, nothing on the driver).
  *
  * Image decode / resize / feature-extract are REAL (JDK javax.imageio
  * handles png+jpeg in this container). Audio/video decode have no codec
  * library here, so [[frameSample]] is a clearly-marked deterministic STUB:
  * the Spark-side plumbing (schema, batch shape, partitioning) is real and
  * tested; the codec call is the single seam to swap in.
  */
object Multimodal {

  final case class ImageMeta(image_id: String, w: Int, h: Int, fmt: String,
      n_bytes: Long, decode_ok: Boolean)

  final case class ImageFeatures(image_id: String,
      mean_r: Double, mean_g: Double, mean_b: Double,
      std_luma: Double, aspect: Double)

  final case class Frame(media_id: String, frame_idx: Int, ts_ms: Long,
      frame_bytes: Array[Byte])

  /** Decode + verify metadata of an images table (binary column → typed). */
  def decodeMeta(spark: SparkSession, images: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        try {
          val img = ImageValidate.decode(bytes)
          ImageMeta(id, img.getWidth, img.getHeight, fmt, bytes.length.toLong, img != null)
        } catch {
          case _: Exception => ImageMeta(id, -1, -1, fmt, bytes.length.toLong, false)
        }
      })
  }

  /** Per-channel feature extraction over decoded pixels. */
  def extractFeatures(spark: SparkSession, images: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = ImageValidate.decode(bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb, sl, sl2) = (0.0, 0.0, 0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += l; sl2 += l * l
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        ImageFeatures(id, sr / n, sg / n, sb / n,
          math.sqrt(math.max(sl2 / n - (sl / n) * (sl / n), 0.0)), w.toDouble / h)
      })
  }

  /** Bilinear resize (real, Graphics2D) of every image to (tw, th). */
  def resizeAll(spark: SparkSession, images: DataFrame, tw: Int, th: Int): DataFrame = {
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val src = ImageValidate.decode(bytes)
        val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, tw, th, null)
        g.dispose()
        (id, graft.fixtures.ImageGen.encode(dst, "png"), tw, th)
      }).toDF("image_id", "bytes", "w", "h")
  }

  /** Frame sampling from a video binary column.
    *
    * STUB: no video codec ships in this container, so the "decoder" is a
    * deterministic fake — frame bytes are a seeded function of
    * (media_id, frame_idx). The plumbing around it (fps math, batch
    * iterator shape, output schema) is the real thing a codec would slot
    * into at the marked line.
    */
  def frameSample(spark: SparkSession, media: DataFrame,
      everyMs: Long, maxFrames: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select("media_id", "duration_ms").as[(String, Long)]
      .mapPartitions(_.flatMap { case (id, durMs) =>
        val n = math.min(maxFrames.toLong, durMs / math.max(everyMs, 1L)).toInt
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          // >>> STUB: replace with real codec call: decodeFrameAt(bytes, ts)
          val fake = java.nio.ByteBuffer.allocate(16)
            .putLong(graft.functions.GraftHash.mix64(graft.functions.GraftHash.xxhash64(id), ts))
            .putLong(ts).array()
          // <<< STUB
          Frame(id, i, ts, fake)
        }
      })
  }
}
