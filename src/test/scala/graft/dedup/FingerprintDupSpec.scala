package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fingerprint-overlap (copied-span) near-dup operator: a shared
  * verbatim passage pairs two otherwise-different documents; corpus-wide
  * boilerplate is capped observably instead of going quadratic.
  */
class FingerprintDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val quote = "the winnowing scheme keeps the minimum hash of every sliding window over kgram hashes"

  test("a shared long passage pairs two documents with different surroundings") {
    val docs = Seq(
      (1L, s"totally unrelated preamble about spark codegen stages. $quote and a local tail"),
      (2L, s"$quote but embedded in different context entirely with other words"),
      (3L, "nothing in common here at all: broadcast joins, shuffle partitions, bloom probes"))
      .toDF("doc_id", "text")
    val pairs = Dedup.fingerprintNearDups(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs.head._3 >= 5L, s"shared prints: ${pairs.head._3}")
  }

  test("documents with no copied span produce no pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    assert(Dedup.fingerprintNearDups(docs, "doc_id", "text").count() === 0L)
  }

  test("hot boilerplate fingerprints are capped, observably; unrelated planted pair survives") {
    val boiler = "subscribe to our newsletter for updates terms of service apply everywhere"
    // 8 docs share ONLY the boilerplate; 2 docs share a distinct passage
    val boilerDocs = (0 until 8).map { i =>
      (100L + i, s"unique$i filler$i opening$i words$i. $boiler closing$i remark$i")
    }
    val planted = Seq(
      (1L, s"first context. $quote"),
      (2L, s"$quote second context"))
    val docs = (boilerDocs ++ planted).toDF("doc_id", "text")

    val capped = Dedup.fingerprintNearDups(docs, "doc_id", "text", maxBucket = 4L)
      .as[(Long, Long, Long)].collect().toSeq
    // boilerplate-only pairs are gone (every shared print sat in an oversize
    // bucket); the planted pair's prints are held by 2 docs and survive
    assert(capped.map(p => (p._1, p._2)) === Seq((1L, 2L)))

    val oversize = Dedup.fingerprintOversizeBuckets(docs, "doc_id", "text", maxBucket = 4L)
    assert(oversize.count() > 0L, "the cap must be observable, never silent")

    // uncapped, the boilerplate flood pairs up — the cap is what prevents
    // the quadratic candidate set
    val uncapped = Dedup.fingerprintNearDups(docs, "doc_id", "text")
      .filter(col("id1") >= 100L).count()
    assert(uncapped === 8L * 7 / 2)
  }
}
