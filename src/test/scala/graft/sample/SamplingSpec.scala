package graft.sample

import graft.SparkTestBase
import graft.functions.GraftHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the deterministic sampling/mixing operators against an independent
  * driver-side recompute of the same hash (GraftHash.mix64 — the scalar the
  * codegen expression wraps), so the MEMBERSHIP contract is verified, not
  * just sizes.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet(SparkTestBase.sfDir + "/documents.parquet")
  lazy val docIdLang: Seq[(Long, String)] =
    docs.select(col("doc_id"), col("lang")).as[(Long, String)].collect().toSeq

  private val rates = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25)

  test("stratified sample membership matches a driver-side hash recompute") {
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", rates,
        defaultRate = 1.0, salt = 77L)
      .select(col("doc_id")).as[Long].collect().toSet
    val want = docIdLang.filter { case (id, lang) =>
      val b = java.lang.Math.floorMod(GraftHash.mix64(id, 77L), Sampling.Res.toLong)
      b < math.round(rates.getOrElse(lang, 1.0) * Sampling.Res)
    }.map(_._1).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < docIdLang.size)
  }

  test("rate 0 drops a stratum entirely; rate 1 keeps it entirely") {
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("en" -> 0.0), defaultRate = 1.0, salt = 5L)
      .select(col("lang")).as[String].collect()
    assert(!sampled.contains("en"))
    val nonEn = docIdLang.count(_._2 != "en")
    assert(sampled.length === nonEn)
  }

  test("uniform per-stratum top-k: exactly min(k, |stratum|) rows, rank order matches recompute") {
    val k = 3
    val got = Sampling.uniformPerStratum(docs, "lang", "doc_id", k, salt = 91L)
      .select(col("lang"), col("doc_id"), col("rk"))
      .as[(String, Long, Int)].collect().toSeq
    val byLang = docIdLang.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val wantIds = rows.map(_._1)
        .sortBy(id => (GraftHash.mix64(id, 91L), id))
        .take(k)
      val gotRows = got.filter(_._1 == lang).sortBy(_._3)
      assert(gotRows.map(_._2) === wantIds, s"lang=$lang")
      assert(gotRows.map(_._3) === (1 to wantIds.size), s"lang=$lang ranks")
    }
    assert(got.size === byLang.valuesIterator.map(r => math.min(k, r.size)).sum)
  }

  test("temperature weights: sum to 1, sqrt-tempered, alpha=1 is proportional") {
    val w = Sampling.temperatureWeights(docs, "lang")
      .as[(String, Long, Double)].collect().toSeq
    assert(math.abs(w.map(_._3).sum - 1.0) < 1e-4)
    val counts = docIdLang.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val z = counts.values.map(math.sqrt).sum
    w.foreach { case (lang, n, weight) =>
      assert(n.toDouble === counts(lang))
      assert(math.abs(weight - math.sqrt(n.toDouble) / z) < 1e-6, s"lang=$lang")
    }
    // alpha < 1 compresses the mixture vs proportional: max stratum gets
    // LESS than its share, min stratum MORE
    val prop = Sampling.temperatureWeights(docs, "lang", alpha = 1.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val maxLang = counts.maxBy(_._2)._1
    val minLang = counts.minBy(_._2)._1
    val sqrtW = w.map(r => r._1 -> r._3).toMap
    assert(sqrtW(maxLang) < prop(maxLang))
    assert(sqrtW(minLang) > prop(minLang))
  }

  test("sampling is deterministic across plans and re-runs") {
    def run() = Sampling.stratifiedSample(docs.repartition(7), "lang", "doc_id",
        rates, defaultRate = 1.0, salt = 77L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(run() === run())
  }
}
