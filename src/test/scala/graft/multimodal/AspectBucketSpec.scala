package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins SDXL-style aspect bucketing against a plain-Scala argmin oracle over
  * the full fixture dimension lattice.
  */
class AspectBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val ladder = Multimodal.DefaultAspectLadder

  private def oracle(w: Int, h: Int, lad: Seq[(Int, Int)]): (Int, Int) = {
    val la = math.log(w.toDouble / h)
    // first minimum wins — same contract as the Column argmin
    lad.minBy { case (bw, bh) => math.abs(la - math.log(bw.toDouble / bh)) }
  }

  test("assignment equals plain-Scala argmin on the full 32..128 lattice") {
    val dims = for (w <- Seq(32, 64, 96, 128); h <- Seq(32, 64, 96, 128))
      yield (s"${w}x$h", w, h)
    val got = Multimodal.bucketImages(dims.toDF("image_id", "w", "h"))
      .as[(String, Int, Int)].collect()
      .map { case (id, bw, bh) => id -> ((bw, bh)) }.toMap
    dims.foreach { case (id, w, h) =>
      assert(got(id) === oracle(w, h, ladder), s"dims $id")
    }
  }

  test("poles: square -> (256,256); 1:4 tall -> (128,512); 4:1 wide -> (512,128)") {
    val m = Multimodal.bucketImages(
        Seq(("sq", 96, 96), ("tall", 32, 128), ("wide", 128, 32))
          .toDF("image_id", "w", "h"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(m("sq") === ((256, 256)))
    assert(m("tall") === ((128, 512)))
    assert(m("wide") === ((512, 128)))
  }

  test("exact tie breaks to the earlier ladder entry") {
    // two ladder entries with the SAME aspect: the first must win
    val tieLadder = Seq((128, 128), (256, 256))
    val m = Multimodal.bucketImages(
        Seq(("a", 64, 64)).toDF("image_id", "w", "h"), tieLadder)
      .collect().map(r => (r.getInt(1), r.getInt(2))).head
    assert(m === ((128, 128)))
  }

  test("plan: pure projection — no Exchange, no join") {
    val plan = Multimodal.bucketImages(
        Seq(("a", 64, 64)).toDF("image_id", "w", "h"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(!plan.toLowerCase.contains("join"), plan.take(1500))
  }
}
