package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-set decontamination — the check a training-data pipeline runs
  * before a corpus ships: flag documents whose text overlaps a held-out
  * benchmark, so the model is never trained on (near-copies of) its own
  * test questions. The standard detector is word-n-gram overlap: a document
  * is contaminated when it shares ≥ `minHits` distinct word n-grams with
  * any eval document.
  *
  * Scale shape: eval sets are small (10³–10⁵ rows) and the corpus is the
  * 100 TB side, so the eval grams are distinct-ed and BROADCAST while the
  * corpus side is one linear explode → broadcast semi-join → partial-agg
  * groupBy(doc_id) — the corpus never shuffles its text, only (doc_id,
  * gram-hash) pairs that actually matched. Grams ride as 64-bit hashes, not
  * strings; the external oracle joins on the gram STRINGS instead, so a
  * hash collision that ever changed a count would surface as a mismatch.
  * Everything is built-in codegen column functions — no UDFs.
  */
object Decontaminate {

  /** Word n-grams of `text`: lowercase, whitespace-split, each sliding
    * window of `n` tokens joined by single spaces (so variant whitespace
    * normalizes away). Fewer than `n` tokens → no grams.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
  }

  /** Contaminated documents: (doc_id, n_hits) where n_hits = distinct
    * shared word-n-grams with the eval set, n_hits ≥ minHits.
    */
  def overlap(docs: DataFrame, docIdCol: String, docTextCol: String,
      evalSet: DataFrame, evalTextCol: String,
      n: Int = 8, minHits: Long = 3L): DataFrame = {
    // r6 (guide §2.5): the n-gram build is the expensive projection and
    // otherwise fuses into the (single-task at small SF) scan stage —
    // spread both sides across cores first (no-op at scale, see
    // [[graft.functions.Parallelize]]). Same grams, same counts.
    val evalGrams = graft.functions.Parallelize.spreadForCompute(
      evalSet.select(col(evalTextCol)))
      .select(explode(wordNgrams(col(evalTextCol), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gh"))
      .distinct()
    val docGrams = graft.functions.Parallelize.spreadForCompute(
      docs.select(col(docIdCol), col(docTextCol)))
      .select(col(docIdCol).as("doc_id"),
        explode(wordNgrams(col(docTextCol), n)).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
    docGrams.join(broadcast(evalGrams), Seq("gh"), "left_semi")
      .groupBy("doc_id")
      .agg(count_distinct(col("gh")).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }
}
