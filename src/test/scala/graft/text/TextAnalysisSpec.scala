package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("langid identifies real sentences in all five languages") {
    val fixtures = Seq(
      ("the cat sat on the mat and it was happy for a while", "en"),
      ("der hund ist nicht mit der katze auf das sofa gegangen", "de"),
      ("le chat est dans la maison et les enfants sont pour une heure", "fr"),
      ("el perro es una mascota que vive en la casa con los gatos", "es"),
      ("今天天气很好我们一起去公园散步吧然后吃饭", "zh"),
      ("xyzzy qwerty plugh", "und"))
    val got = fixtures.map(_._1).toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang")).as[String].collect()
    got.zip(fixtures).foreach { case (pred, (text, want)) =>
      assert(pred === want, s"text: $text")
    }
  }

  test("token counting: whitespace + bpe-ish") {
    val df = Seq("hello world  foo", "", "a b42 c!d").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeIshTokenCount(col("text")).as("b"))
      .as[(Int, Int)].collect()
    assert(got(0)._1 === 3)
    assert(got(1)._1 === 0)
    assert(got(2)._1 === 3)
    assert(got(2)._2 === 6) // "a", " b", "42", " c", "!", "d"
  }

  test("quality score ranks clean text above junk") {
    val clean = "the quick brown fox jumps over the lazy dog and runs to the house " * 8
    val junk = "!!! ??? ;;; ,,, ### $$$ %%%"
    val got = Seq(clean, junk).toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).as[Double].collect()
    assert(got(0) > 0.7, s"clean scored ${got(0)}")
    assert(got(0) > got(1) + 0.3)
  }

  test("winnowing fingerprint: stable under local edit, distinct for different docs") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val aEdit = a.replace("lazy", "hazy")
    val b = "completely different content about spark shuffle partitions and codegen"
    val fps = Seq(a, aEdit, b).toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[Seq[Long]].collect()
    def overlap(x: Seq[Long], y: Seq[Long]): Double =
      x.toSet.intersect(y.toSet).size.toDouble / x.toSet.union(y.toSet).size
    assert(overlap(fps(0), fps(1)) > 0.5, "local edit should keep most fingerprints")
    assert(overlap(fps(0), fps(2)) < 0.05, "unrelated docs should share ~none")
  }

  test("fingerprint/quality/tokens handle degenerate inputs") {
    val df = Seq("", "x", "        ").toDF("text")
    val rows = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.qualityScore(col("text")),
      size(TextAnalysis.fingerprint(col("text")))).collect()
    assert(rows.length === 3) // no exceptions, all defined
  }
}
