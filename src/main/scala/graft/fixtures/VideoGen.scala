package graft.fixtures

import graft.functions.GraftHash.mix64
import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic MJPEG-in-AVI video fixtures — REAL container bytes built
  * with the JDK alone (RIFF writer here + per-frame ImageIO JPEG encode),
  * the same no-external-codec move as [[AudioGen]]'s WAV clips. Clip
  * parameters are closed-form in the id so a DuckDB oracle can recompute
  * frame counts, timestamps, and dimensions without decoding:
  *
  *   fps(i)      = 5 + floorMod(mix64(mix64(i) ^ 11), 6)         ∈ [5, 10]
  *   nFrames(i)  = 4 + floorMod(mix64(mix64(i) ^ 12), 5)         ∈ [4, 8]
  *   w(i), h(i)  = the [[ImageGen.raster]] dims of seed i
  *                 (32 + floorMod(mix64(mix64(i) ^ 1|2), 4) · 32)
  *
  * Every frame is a real JPEG of the clip's textured raster with a
  * frame-dependent marker block, so the decode path is exercised per frame,
  * not just per clip.
  */
object VideoGen {

  def idOf(i: Long): String = f"vid$i%06d"
  def fps(i: Long): Int = 5 + java.lang.Math.floorMod(mix64(i, 11L), 6L).toInt
  def nFrames(i: Long): Int = 4 + java.lang.Math.floorMod(mix64(i, 12L), 5L).toInt

  /** Frame f of clip i: the clip's textured raster (dims fixed per clip)
    * shifted by a per-frame brightness offset — every frame's pixels are
    * distinct, but the change is SMOOTH (a DC shift), so the JPEG
    * round-trip still clears the 40 dB PSNR payload gate (a sharp random
    * marker block would not survive 4:2:0-era quantization on a small
    * raster).
    */
  def frameImage(i: Long, f: Int): java.awt.image.BufferedImage = {
    val img = ImageGen.texturedRaster(i)
    val off = (f - 4) * 3 // distinct per frame index, f ∈ [0, 8)
    def c(v: Int): Int = math.max(0, math.min(255, v))
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        img.setRGB(x, y, (c(((p >> 16) & 0xff) + off) << 16) |
          (c(((p >> 8) & 0xff) + off) << 8) | c((p & 0xff) + off))
        x += 1
      }
      y += 1
    }
    img
  }

  /** The clip's AVI container bytes. */
  def aviOf(i: Long): Array[Byte] = {
    val frames = (0 until nFrames(i)).map(f =>
      ImageGen.encode(frameImage(i, f), "jpeg"))
    val img0 = ImageGen.raster(i) // dims only (same formula as the frames)
    buildAvi(frames, fps(i), img0.getWidth, img0.getHeight)
  }

  /** Minimal-but-well-formed AVI: RIFF(AVI ) { LIST(hdrl){ avih,
    * LIST(strl){ strh(vids/MJPG), strf(BITMAPINFOHEADER/MJPG) } },
    * LIST(movi){ 00dc… }, idx1 }. Little-endian throughout; odd chunks
    * padded to even per RIFF.
    */
  def buildAvi(frames: Seq[Array[Byte]], fps: Int, w: Int, h: Int): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ u32(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ u32(body.length + 4L) ++ fcc(typ) ++ body

    val maxFrame = frames.map(_.length).max
    val avih = chunk("avih",
      u32(1000000L / fps) ++ u32(maxFrame.toLong * fps) ++ u32(0) ++
        u32(0x10) /* AVIF_HASINDEX */ ++ u32(frames.length.toLong) ++ u32(0) ++
        u32(1) /* streams */ ++ u32(maxFrame.toLong) ++
        u32(w.toLong) ++ u32(h.toLong) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ u32(0) ++ u16(0) ++ u16(0) ++ u32(0) ++
        u32(1) /* scale */ ++ u32(fps.toLong) /* rate */ ++ u32(0) ++
        u32(frames.length.toLong) ++ u32(maxFrame.toLong) ++ u32(0xffffffffL) ++
        u32(0) ++ u16(0) ++ u16(0) ++ u16(w) ++ u16(h))
    val strf = chunk("strf",
      u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++ u16(1) ++ u16(24) ++
        fcc("MJPG") ++ u32(w.toLong * h * 3) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviBody = new ByteArrayOutputStream()
    val idxBody = new ByteArrayOutputStream()
    var off = 4L // offsets conventionally relative to the 'movi' fourcc
    frames.foreach { fb =>
      moviBody.write(chunk("00dc", fb))
      idxBody.write(fcc("00dc")); idxBody.write(u32(0x10)) // AVIIF_KEYFRAME
      idxBody.write(u32(off)); idxBody.write(u32(fb.length.toLong))
      off += 8 + fb.length + (fb.length % 2)
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = chunk("idx1", idxBody.toByteArray)

    val riffBody = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ u32(riffBody.length.toLong) ++ riffBody
  }

  /** Distributed generation of a (media_id, bytes) video table. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).as[Long]
      .map(i => (idOf(i), aviOf(i)))
      .toDF("media_id", "bytes")
  }
}
