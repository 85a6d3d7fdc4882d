package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the deflate compression-ratio signal: poles, flag margins on the
  * planted classes, empty-text contract, determinism, and sane ranges on
  * the real documents table.
  */
class CompressionRatioSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("poles: pure repetition deflates to ~nothing; hex gibberish stays above 0.5") {
    val docs = Seq(
      (0L, "a" * 10000),
      (1L, "the quick brown fox jumps over the lazy dog " * 40),
      (2L, (0 until 64).map(j => f"${graft.functions.GraftHash.mix64(j + 7L)}%016x").mkString(" ")),
      (3L, "")
    ).toDF("doc_id", "text")
    val m = CompressionRatio.deflateRatio(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(0L) < 0.01, s"all-same-char ratio ${m(0L)}")
    assert(m(1L) < 0.05, s"repeated-phrase ratio ${m(1L)}")
    assert(m(2L) > 0.5, s"hex-gibberish ratio ${m(2L)}")
    assert(m(3L) === 0.0, "empty text has ratio 0 by contract")
  }

  test("flags on the planted two-class corpus are exactly the class parity") {
    val docs = (0L until 60L).map { i =>
      val text =
        if (i % 2 == 0) "the quick brown fox jumps over the lazy dog " * 40
        else (0 until 64)
          .map(j => f"${graft.functions.GraftHash.mix64(i * 131 + j)}%016x")
          .mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val flags = CompressionRatio.repetitiveFlags(spark, docs, "doc_id", "text")
      .as[(Long, Int)].collect().toMap
    (0L until 60L).foreach { i =>
      assert(flags(i) === (if (i % 2 == 0) 1 else 0), s"doc $i")
    }
    // and the margins are real: ratios at least 0.15 from the threshold
    val ratios = CompressionRatio.deflateRatio(spark, docs, "doc_id", "text")
      .as[CompressionRatio.DocCompression].collect()
    ratios.foreach { r =>
      assert(math.abs(r.ratio - 0.35) > 0.15,
        s"doc ${r.doc_id} ratio ${r.ratio} too close to the 0.35 threshold")
    }
  }

  test("deterministic: two runs produce identical bytes counts") {
    val docs = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .limit(50)
    val a = CompressionRatio.deflateRatio(spark, docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = CompressionRatio.deflateRatio(spark, docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("real documents land in a sane band and are not flagged en masse") {
    val docs = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
    val ratios = CompressionRatio.deflateRatio(spark, docs, "doc_id", "text")
      .agg(min("ratio").as("lo"), max("ratio").as("hi"),
        sum((col("ratio") < 0.35).cast("int")).as("n_flagged"),
        count(lit(1)).as("n"))
      .collect().head
    assert(ratios.getDouble(0) > 0.0)
    assert(ratios.getDouble(1) <= 1.2, "deflate can pad, but never past +20%")
    // driver text is word-salad prose: a majority must NOT read as repetitive
    assert(ratios.getLong(2) < ratios.getLong(3) / 2,
      s"${ratios.getLong(2)}/${ratios.getLong(3)} docs flagged repetitive")
  }
}
