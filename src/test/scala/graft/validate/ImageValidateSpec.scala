package graft.validate

import graft.SparkTestBase
import graft.fixtures.ImageGen
import org.scalatest.funsuite.AnyFunSuite

class ImageValidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("input_hint invariant: png exact, jpeg PSNR >= 40dB, captions equal") {
    val images = ImageGen.generate(spark, 200, partitions = 4).toDF().cache()
    assert(images.count() === 200)
    val verdicts = ImageValidate.validate(spark, images)
    val (rows, pixFail, capFail, minPsnr) = ImageValidate.summarize(verdicts)
    assert(rows === 200)
    assert(pixFail === 0L, s"pixel invariant failures (min lossy PSNR=$minPsnr)")
    assert(capFail === 0L)
    assert(minPsnr >= ImageValidate.PsnrGateDb, s"min jpeg PSNR $minPsnr < 40dB")
    assert(verdicts.filter(_.fmt == "jpeg").count() === 50)
    assert(verdicts.filter(!_.phash_ok).count() === 0)
    images.unpersist()
  }

  test("validation detects corruption") {
    val good = ImageGen.rowOf(7L)
    // corrupt: swap payload with a different image's bytes, break caption
    val bad = good.copy(bytes = ImageGen.rowOf(8L).bytes, caption = good.caption + "!")
    intercept[Throwable] { // size mismatch or pixel failure must surface
      val v = ImageValidate.validate(spark, Seq(bad).toDS().toDF()).collect()
      assert(v.forall(x => x.pixels_ok && x.caption_ok), "corruption not detected")
      throw new AssertionError("corruption not detected")
    }
  }

  test("decode round-trip is deterministic across JVM calls") {
    val a = ImageGen.rowOf(42L)
    val b = ImageGen.rowOf(42L)
    assert(a.bytes.toSeq === b.bytes.toSeq)
    assert(a.phash === b.phash)
    assert(a.caption === b.caption)
  }
}
