package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Within-document repetition metrics — the Gopher-style quality-filter
  * family: machine-generated and boilerplate-stuffed pages repeat lines and
  * phrases, and a training-data pipeline drops documents above repetition
  * thresholds before any cross-document dedup runs.
  *
  * All pure column expressions over per-row arrays — per-document compute,
  * embarrassingly parallel, no shuffle, scan-speed at 100 TB:
  *  - [[dupLineFrac]] / [[dupCharFrac]]: O(L²) in the LINE count via a
  *    filter-count (L is tens-to-hundreds for web pages; a corpus of
  *    pathological 100k-line docs would explode lines to a groupBy
  *    instead — that variant shuffles, so it is not the default);
  *  - [[topRunFrac]]: O(G log G) in the token count — sort the grams, then
  *    one linear run-length pass via `aggregate`, never the O(G²)
  *    every-gram-counts-itself scan.
  */
object Repetition {

  /** Word bigrams of a token array: "tk_i tk_{i+1}". */
  def wordBigrams(tokens: Column): Column =
    when(size(tokens) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(tokens) - 2),
        i => concat(element_at(tokens, i + lit(1)), lit(" "),
          element_at(tokens, i + lit(2)))))

  /** Fraction of lines that are repeats of another line (count-based):
    * (n − n_distinct) / n. Zero for empty input.
    */
  def dupLineFrac(lines: Column): Column =
    when(size(lines) <= 0, lit(0.0)).otherwise(
      (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))

  /** Fraction of CHARACTERS living in duplicated lines (every occurrence of
    * a line that appears more than once counts — the Gopher definition,
    * which weights a repeated long paragraph heavier than a repeated "ok").
    */
  def dupCharFrac(lines: Column): Column = {
    val dupChars = aggregate(lines, lit(0L),
      (acc, l) => acc + when(
        size(filter(lines, x => x === l)) > 1, length(l).cast("long"))
        .otherwise(lit(0L)))
    val totChars = aggregate(lines, lit(0L),
      (acc, l) => acc + length(l).cast("long"))
    when(totChars <= 0, lit(0.0)).otherwise(dupChars.cast("double") / totChars)
  }

  /** Fraction of grams taken by the single most frequent gram: sort, then a
    * run-length `aggregate` (longest run of equal neighbors = the top
    * gram's count). Zero for empty input.
    */
  def topRunFrac(grams: Column): Column = {
    val sorted = array_sort(grams)
    val best = aggregate(sorted,
      struct(lit(0).as("run"), lit(0).as("best"),
        lit(null).cast("string").as("prev")),
      (acc, x) => {
        val run = when(x <=> acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(run.as("run"), greatest(acc("best"), run).as("best"),
          x.as("prev"))
      },
      acc => acc("best"))
    when(size(grams) <= 0, lit(0.0))
      .otherwise(best.cast("double") / size(grams))
  }
}
