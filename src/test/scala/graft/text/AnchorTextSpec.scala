package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class AnchorTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("case/whitespace variants merge into one vote; top-k by count then text") {
    val links = Seq(
      (1L, 10L, "  Spark  Guide "), (2L, 10L, "spark guide"),
      (3L, 10L, "SPARK GUIDE"), (4L, 10L, "api docs"), (5L, 10L, "api docs"),
      (6L, 10L, "zzz rare"), (7L, 10L, "aaa rare"),
      (8L, 20L, "only one")).toDF("src", "dst", "anchor")
    val got = AnchorText.topAnchors(links, "dst", "anchor", k = 3)
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    assert(got(10L).map(r => (r._2, r._3)).toSeq === Seq(
      ("spark guide", 3L), ("api docs", 2L), ("aaa rare", 1L)))
    assert(got(20L).map(r => (r._2, r._3)).toSeq === Seq(("only one", 1L)))
  }

  test("empty and whitespace-only anchors are dropped") {
    val links = Seq((1L, 10L, ""), (2L, 10L, "   "), (3L, 10L, "real"))
      .toDF("src", "dst", "anchor")
    val got = AnchorText.topAnchors(links, "dst", "anchor")
      .as[(Long, String, Long, Int)].collect()
    assert(got.toSeq === Seq((10L, "real", 1L, 1)))
  }
}
