package graft.multimodal

import graft.SparkTestBase
import graft.fixtures.{GifGen, ImageGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the animated-GIF frame-sampling contract: the JDK round-trip
  * (writer → reader) preserves frame count, per-frame delays, and
  * dimensions exactly, and the time-bucket selection rule matches an
  * independent recompute.
  */
class GifFrameSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("round-trip: frame count, per-frame delays, dims match the closed form") {
    (0L until 8L).foreach { i =>
      val frames = Multimodal.parseGif(GifGen.gifOf(i))
      assert(frames.length === GifGen.nFrames(i), s"clip $i")
      val ref = ImageGen.raster(i)
      frames.zipWithIndex.foreach { case ((img, delay), f) =>
        assert(delay === GifGen.delayCs(i, f), s"clip $i frame $f delay")
        assert(img.getWidth === ref.getWidth && img.getHeight === ref.getHeight,
          s"clip $i frame $f dims")
      }
    }
  }

  test("everyMs <= 0 keeps every frame with cumulative-delay timestamps") {
    val media = GifGen.generate(spark, 12)
    val got = Multimodal.frameSampleGif(spark, media, everyMs = 0, maxFrames = 100)
      .select(col("media_id"), col("frame_idx"), col("ts_ms"))
      .as[(String, Int, Long)].collect().toSeq
    val want = (0L until 12L).flatMap(i => (0 until GifGen.nFrames(i)).map(f =>
      (GifGen.idOf(i), f, GifGen.tsMs(i, f))))
    assert(got.sorted === want.sorted)
  }

  test("huge everyMs keeps exactly frame 0 of every clip") {
    val media = GifGen.generate(spark, 10)
    val got = Multimodal.frameSampleGif(spark, media, everyMs = 1000000, maxFrames = 100)
      .select(col("media_id"), col("frame_idx"))
      .as[(String, Int)].collect().toSeq
    assert(got.sorted === (0L until 10L).map(i => (GifGen.idOf(i), 0)).sorted)
  }

  test("bucket selection + maxFrames matches an independent recompute") {
    val (everyMs, maxFrames) = (100L, 3)
    val media = GifGen.generate(spark, 20)
    val got = Multimodal.frameSampleGif(spark, media, everyMs, maxFrames)
      .select(col("media_id"), col("frame_idx"), col("ts_ms"))
      .as[(String, Int, Long)].collect().toSeq
    val want = (0L until 20L).flatMap { i =>
      val ts = (0 until GifGen.nFrames(i)).map(f => GifGen.tsMs(i, f))
      ts.indices.filter(f => f == 0 || ts(f) / everyMs > ts(f - 1) / everyMs)
        .take(maxFrames).map(f => (GifGen.idOf(i), f, ts(f)))
    }
    assert(got.sorted === want.sorted)
    // the rule must both drop some frames and keep some non-zero frames on
    // this fixture — otherwise the test pins a degenerate configuration
    val total = (0L until 20L).map(i => GifGen.nFrames(i)).sum
    assert(got.size < total && got.exists(_._2 > 0))
  }
}
