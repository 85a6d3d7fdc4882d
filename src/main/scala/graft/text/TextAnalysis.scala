package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. All pure column expressions (whole-stage codegen; no
  * UDFs), so they run at scan speed over a 100 TB documents table with
  * filters/pruning pushed down around them.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty text → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alternation of letter-runs / digit-runs /
    * punctuation-runs (each optionally space-prefixed). Mirrors the shape of
    * GPT-2's pre-tokenizer on ASCII without lookaheads, so the same pattern
    * runs identically in Spark and external SQL engines.
    */
  val BpeIshPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeIshTokenCount(text: Column): Column = regexp_count(text, lit(BpeIshPattern))

  /** Heuristic quality score in [0,1]:
    * 0.25·length-band + 0.25·alpha-ratio + 0.25·(1 − punct-ratio·4 capped)
    * + 0.25·stopword-hit-band. Deterministic, columnar.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / 500.0, lit(1.0))
    val alphaRatio = (length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") /
      greatest(len, lit(1.0)))
    val punctRatio = (length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      greatest(len, lit(1.0)))
    val punctScore = greatest(lit(1.0) - punctRatio * 4.0, lit(0.0))
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val toks = tokens(text)
    val stopHits = size(filter(toks, t => t.isin(stops.map(s => s: Any): _*)))
    val stopScore = least(stopHits.cast("double") / 5.0, lit(1.0))
    round((lenScore + alphaRatio + punctScore + stopScore) / 4.0, 6)
  }

  /** Language-ID marker words (tiny curated stopword sets). The heuristic:
    * score(lang) = #tokens in lang's marker set; argmax wins, `und`
    * (undetermined) when all scores are 0.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "que", "por", "con", "para"),
    "zh" -> Seq.empty) // zh detected by CJK-codepoint ratio, not stopwords

  /** n-gram/marker heuristic language ID over the token array. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = LangMarkers.filter(_._2.nonEmpty).map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))
    }
    // CJK ratio for zh: codepoints in the unified ideograph block
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val zhScore = when(cjk * 4 >= length(text), lit(1000)).otherwise(lit(0))
    val all = scores :+ ("zh" -> zhScore)
    val best = greatest(all.map(_._2): _*)
    // fold keeps the LAST matching branch on ties; reverse so ties resolve
    // in declaration order (en before de before fr...)
    all.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Winnowing-style document fingerprint: hash every k-gram (rolling
    * polynomial), then keep the minimum hash of each sliding window of
    * `window` consecutive k-grams (distinct). Robust to local edits; the
    * classic MOSS scheme. One native codegen expression — O(n) per doc where
    * the composed-column form was O(n·k) substring hashes — and the hash is
    * SQL-replayable, so `q_fingerprint` carries a DuckDB oracle. See
    * [[graft.functions.Winnow]].
    */
  def fingerprint(text: Column, k: Int = 8, window: Int = 4): Column =
    graft.functions.Winnow.winnow_fingerprint(text, k, window)
}
