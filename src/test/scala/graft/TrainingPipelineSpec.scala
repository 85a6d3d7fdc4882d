package graft

import graft.dedup.Dedup
import graft.sample.Sampling
import graft.text.{Decontaminate, LmScore, Pii, Repetition, TextAnalysis, TfIdf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-set assembly — every stage a user of this library
  * would chain, composed in the order a real pipeline runs them:
  *
  *   quality gate → repetition gate → PII redact → LM-perplexity gate →
  *   exact dedup → near-dup canonical (MinHash-LSH + connected components)
  *   → eval decontamination → deterministic stratified sample →
  *   TF-IDF term tagging.
  *
  * The corpus is the sf0.001 documents table with PLANTED casualties for
  * every stage (an exact copy, a boilerplate-stuffed page, a PII page, an
  * eval quote), so each stage must drop its plant and ONLY its plant class,
  * and the whole composition must be deterministic across re-runs.
  */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val evalText =
    "which spark operator shuffles on the join key and why does broadcast avoid it"

  /** Base corpus + plants (ids ≥ 9000 so they are recognizable). */
  private lazy val corpus: DataFrame = {
    val base = spark.read.parquet(SparkTestBase.sfDir + "/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val firstText = base.orderBy("doc_id").select("text").as[String].first()
    val plants = Seq(
      (9001L, "en", firstText),                       // exact dup of doc 0
      (9002L, "en", ("subscribe now " * 40).trim),    // repetition junk
      (9003L, "en", s"write to alice@example.org or 10.1.2.3 today. $evalText"),
      (9004L, "en", s"quiz answer sheet: $evalText end of sheet"),
      // keyword-stuffing gibberish: passes the cheap gates (alphabetic, no
      // punctuation, no repeated bigram) — and because this corpus is
      // near-uniform word soup, PURE gibberish would score a NORMAL nll
      // (≈ ln vocab, the corpus's own level). The real outlier shape is a
      // COMMON head with an unseen continuation (huge C1, C2 = 1 from this
      // doc alone), so the plant alternates frequent corpus words with
      // unique junk tokens; its mean −ln p sits far above mean + 3σ
      (9005L, "en", (0 until 20).flatMap(i => Seq(
        Seq("table", "value", "part", "row", "key")(i % 5),
        s"zq${('a' + i / 5).toChar}${('a' + i % 5).toChar}x")).mkString(" ")))
      .toDF("doc_id", "lang", "text")
    base.unionByName(plants)
  }

  private def assemble(c: DataFrame): DataFrame = {
    // 1. quality + repetition gates (pure filters)
    val gated = c
      .filter(TextAnalysis.qualityScore(col("text")) > 0.3)
      .filter(Repetition.topRunFrac(
        Repetition.wordBigrams(split(col("text"), "\\s+"))) < 0.2)
    // 2. PII scrub (projection)
    val scrubbed = gated.withColumn("text", Pii.redact(col("text")))
    // 2.5 LM-perplexity gate: drop statistical outliers under the corpus's
    // own bigram model (mean + 3σ — a relative threshold, so it tracks any
    // corpus; docs with < 2 tokens have no score and drop with the junk)
    val lmScores = LmScore.bigramNll(scrubbed, "doc_id", "text")
    val thr = lmScores.agg(
      (avg(col("avg_nll")) + stddev(col("avg_nll")) * 3).as("thr"))
    val lmKeep = lmScores.crossJoin(broadcast(thr))
      .filter(col("avg_nll") <= col("thr"))
      .select(col("id").as("doc_id"))
    val fluent = scrubbed.join(lmKeep, Seq("doc_id"), "left_semi")
    // 3. exact dedup: keep each content group's keeper
    val keepers = Dedup.exactDupGroups(fluent, "doc_id", "text")
      .select(col("keeper_id").as("doc_id"))
    val exactDeduped = fluent.join(keepers, Seq("doc_id"), "left_semi")
    // 4. near-dup canonical via MinHash pairs + connected components
    val pairs = Dedup.minhashNearDups(exactDeduped, "doc_id", "text")
    val canonical = Dedup.dedupCanonical(exactDeduped, "doc_id", pairs)
    // 5. decontamination: drop anything overlapping the eval set
    val contaminated = Decontaminate.overlap(canonical, "doc_id", "text",
      Seq(evalText).toDF("text"), "text", n = 8, minHits = 1L)
      .select("doc_id")
    val clean = canonical.join(contaminated, Seq("doc_id"), "left_anti")
    // 6. deterministic stratified sample
    Sampling.stratifiedSample(clean, "lang", "doc_id",
      rates = Map("en" -> 0.8), defaultRate = 0.5, salt = 13L)
  }

  test("each planted casualty is dropped by its own stage; survivors form a clean sample") {
    val out = assemble(corpus).localCheckpoint(true)
    val ids = out.select("doc_id").as[Long].collect().toSet

    // the exact dup lost to its keeper (doc 0 has the smaller id)
    assert(!ids.contains(9001L))
    // the repetition plant is gone (top bigram "subscribe now" dominates)
    assert(!ids.contains(9002L))
    // the gibberish plant passed the cheap gates but the corpus-trained
    // bigram LM flags it as an outlier
    assert(!ids.contains(9005L))
    // both eval-quoting plants are gone — including the PII one, whose
    // contamination must be detected on the REDACTED text
    assert(!ids.contains(9003L) && !ids.contains(9004L))
    assert(ids.nonEmpty, "the pipeline must not drop the whole corpus")

    // no PII survives anywhere in the final sample
    val pii = out.agg(sum(Pii.emailCount(col("text"))
      + Pii.ipv4Count(col("text")) + Pii.phoneCount(col("text"))))
      .as[Long].collect().head
    assert(pii === 0L)

    // near-dup canonicalization did real work on the base corpus: the
    // minhash twins collapse, so the sample is strictly smaller than a
    // no-dedup run of the same gates+sample
    val noDedup = corpus
      .filter(TextAnalysis.qualityScore(col("text")) > 0.3)
    assert(out.count() < noDedup.count())

    // enrichment composes: every sampled doc gets at least one TF-IDF tag
    val tagged = TfIdf.topTerms(out, "doc_id", "text", k = 3)
      .select(col("id").as("doc_id")).distinct()
    assert(tagged.count() === out.count())
  }

  test("the composed pipeline is deterministic across re-runs and replans") {
    val a = assemble(corpus).select("doc_id").as[Long].collect().toSet
    val b = assemble(corpus.repartition(7)).select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }
}
