package graft.fixtures

import graft.functions.GraftHash.mix64
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic ANIMATED-GIF fixtures — real multi-frame GIF bytes written
  * with the JDK's own ImageIO GIF sequence writer, the same
  * no-external-codec move as [[AudioGen]] (WAV) and [[VideoGen]] (MJPEG-AVI).
  * Unlike AVI's single fps, GIF carries a PER-FRAME delay, which is exactly
  * what makes it the right second container to exercise: frame timestamps
  * are a running sum, not an index multiple, so time-based sampling does
  * real work.
  *
  * Clip parameters are closed-form in the id so a DuckDB oracle recomputes
  * frame counts, per-frame delays, cumulative timestamps, and dimensions
  * without decoding:
  *
  *   nFrames(i)      = 3 + floorMod(mix64(i, 31), 5)        ∈ [3, 7]
  *   delayCs(i, f)   = 3 + floorMod(mix64(i, 40 + f), 8)    ∈ [3, 10] (cs)
  *   ts_ms(i, f)     = 10 · Σ_{g<f} delayCs(i, g)
  *   w(i), h(i)      = the [[ImageGen.raster]] dims of seed i
  */
object GifGen {

  def idOf(i: Long): String = f"gif$i%06d"
  def nFrames(i: Long): Int = 3 + java.lang.Math.floorMod(mix64(i, 31L), 5L).toInt
  def delayCs(i: Long, f: Int): Int =
    3 + java.lang.Math.floorMod(mix64(i, 40L + f), 8L).toInt

  /** Timestamp of frame f in ms (cumulative sum of prior delays). */
  def tsMs(i: Long, f: Int): Long =
    (0 until f).map(g => delayCs(i, g).toLong).sum * 10L

  /** The clip's animated-GIF container bytes: every frame is the clip's
    * textured raster under a per-frame DC brightness shift (distinct pixels
    * per frame, dims fixed per clip), each with its own delay in the
    * GraphicControlExtension.
    */
  def gifOf(i: Long): Array[Byte] = {
    val frames = (0 until nFrames(i)).map(f => VideoGen.frameImage(i, f))
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.zipWithIndex.foreach { case (img, f) =>
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs(i, f).toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Distributed generation of a (media_id, bytes) animated-GIF table. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).as[Long]
      .map(i => (idOf(i), gifOf(i)))
      .toDF("media_id", "bytes")
  }
}
