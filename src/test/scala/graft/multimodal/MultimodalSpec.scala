package graft.multimodal

import graft.SparkTestBase
import graft.fixtures.ImageGen
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val images = ImageGen.generate(spark, 60, partitions = 4).toDF().cache()

  test("decodeMeta recovers true dimensions from the binary column") {
    val meta = Multimodal.decodeMeta(spark, images).collect()
    assert(meta.length === 60)
    assert(meta.forall(_.decode_ok))
    val truth = images.select("image_id", "w", "h").as[(String, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    meta.foreach(m => assert(truth(m.image_id) === ((m.w, m.h)), m.image_id))
  }

  test("feature extraction: gradient rasters have sane channel means") {
    val f = Multimodal.extractFeatures(spark, images).collect()
    assert(f.forall(x => x.mean_r > 60 && x.mean_r < 200)) // mid-gradient
    assert(f.forall(_.std_luma > 0))
    assert(f.forall(x => x.aspect > 0.2 && x.aspect < 5.0))
  }

  test("resize produces decodable images at target size") {
    val resized = Multimodal.resizeAll(spark, images.limit(10), 16, 16)
    val metas = Multimodal.decodeMeta(spark,
      resized.withColumn("fmt", org.apache.spark.sql.functions.lit("png"))).collect()
    assert(metas.length === 10)
    assert(metas.forall(m => m.w === 16 && m.h === 16 && m.decode_ok))
  }

  test("frameSample stub: deterministic schema-correct batches") {
    val media = Seq(("vidA", 10000L), ("vidB", 1500L), ("vidC", 100L))
      .toDF("media_id", "duration_ms")
    val frames = Multimodal.frameSample(spark, media, everyMs = 1000, maxFrames = 5)
      .collect()
    val byId = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(byId === Map("vidA" -> 5, "vidB" -> 1)) // vidC too short → 0 frames
    val again = Multimodal.frameSample(spark, media, 1000, 5).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.frame_bytes.toSeq)).toSet ===
      again.map(f => (f.media_id, f.frame_idx, f.frame_bytes.toSeq)).toSet)
  }
}
