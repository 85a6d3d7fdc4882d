package graft

import graft.dedup.Dedup
import graft.functions.GraftExpressions.nfc_normalize
import graft.sample.Sampling
import graft.text.{CompressionRatio, Decontaminate, LmScore, Pii, Repetition, TextAnalysis, TfIdf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-set assembly — every stage a user of this library
  * would chain, composed in the order a real pipeline runs them:
  *
  *   NFC normalize → quality gate → repetition gate → compression-ratio
  *   gate → PII redact → LM-perplexity gate → exact dedup → near-dup
  *   canonical (MinHash-LSH + connected components) → eval decontamination
  *   → deterministic stratified sample → TF-IDF term tagging.
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
        s"zq${('a' + i / 5).toChar}${('a' + i % 5).toChar}x")).mkString(" ")),
      // Unicode twins: same shuffled corpus words (so every statistical
      // gate sees a typical doc), suffixed with caf-e-acute PRECOMPOSED
      // (9006) vs DECOMPOSED (9007). Only NFC normalization makes them
      // exact duplicates — shuffling keeps 3-shingle overlap with doc 0
      // far below the minhash threshold, so exact dedup is the stage on
      // the hook.
      (9006L, "en", shuffledFirst + " caf\u00e9 finale"),
      (9007L, "en", shuffledFirst + " cafe\u0301 finale"),
      // long-RANGE repetition: a 20-word paragraph repeated 10×. Every
      // line is unique and the top bigram holds ~5% share, so the cheap
      // repetition gate passes — the deflate ratio (~0.1) catches it.
      (9008L, "en", Seq.fill(10)(firstText.split(" ").take(20).mkString(" "))
        .mkString(". ")))
      .toDF("doc_id", "lang", "text")
    base.unionByName(plants)
  }

  private lazy val shuffledFirst = {
    val base = spark.read.parquet(SparkTestBase.sfDir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val words = base.orderBy("doc_id").select("text").as[String].first().split(" ")
    new scala.util.Random(9).shuffle(words.toList).mkString(" ")
  }

  private def assemble(c: DataFrame): DataFrame = {
    // 0. Unicode NFC canonicalization — BEFORE any equality-based stage,
    // so decomposed/precomposed variants of the same text hash together
    val normalized = c.withColumn("text", nfc_normalize(col("text")))
    // 1. quality + repetition gates (pure filters)
    val gated = normalized
      .filter(TextAnalysis.qualityScore(col("text")) > 0.3)
      .filter(Repetition.topRunFrac(
        Repetition.wordBigrams(split(col("text"), "\\s+"))) < 0.2)
    // 1b. compression-ratio gate: long-RANGE repetition the line/bigram
    // censuses cannot see (repeated paragraphs deflate to almost nothing)
    val unflagged = CompressionRatio
      .repetitiveFlags(spark, gated, "doc_id", "text")
      .filter(col("is_repetitive") === 0).select("doc_id")
    val prose = gated.join(unflagged, Seq("doc_id"), "left_semi")
    // 2. PII scrub (projection)
    val scrubbed = prose.withColumn("text", Pii.redact(col("text")))
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
    // the DECOMPOSED Unicode twin lost to its precomposed keeper — and
    // only NFC makes that happen: on raw text the pair is not an exact
    // group at all
    assert(!ids.contains(9007L))
    val pair = corpus.filter(col("doc_id").isin(9006L, 9007L))
    assert(Dedup.exactDupGroups(pair, "doc_id", "text")
      .filter(col("dup_count") > 1).count() === 0)
    assert(Dedup.exactDupGroups(
        pair.withColumn("text", nfc_normalize(col("text"))), "doc_id", "text")
      .filter(col("dup_count") > 1 && col("keeper_id") === 9006L).count() === 1)
    // the long-range repetition plant passed the cheap gates but its
    // deflate ratio flags it
    assert(!ids.contains(9008L))
    assert(CompressionRatio.repetitiveFlags(spark,
        corpus.filter(col("doc_id") === 9008L), "doc_id", "text")
      .filter(col("is_repetitive") === 1).count() === 1)
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
