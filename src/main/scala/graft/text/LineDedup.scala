package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document line-level dedup — the C4/CCNet boilerplate-removal
  * step between HTML extraction and whole-document dedup: a line that
  * recurs across many documents ("all rights reserved", cookie banners,
  * nav crumbs) is template, not content, and C4 drops such lines from
  * every document while keeping the documents themselves. This is a
  * different axis from both `Dedup` (whole-doc / near-doc identity) and
  * `Repetition` (WITHIN-doc duplication): the unit is the line, the
  * scope is the corpus.
  *
  * Scale shape (the operator is three keyed jobs, nothing driver-side):
  *   1. census — explode to (doc, pos, line) map-side, then ONE
  *      hash-aggregate on the line key counting DISTINCT docs
  *      (partial-aggregated: a line repeated within one doc's partition
  *      reaches the reducer once). The shuffle carries (key 8 B, doc 8 B)
  *      — never line text. Lines ride as `xxhash64` of the normalized
  *      form; the DuckDB oracle recomputes the census on the STRINGS, so
  *      a hash collision that changed any count would mismatch (the
  *      [[Decontaminate]] discipline).
  *   2. drop — left-anti join of the exploded lines against the common
  *      set (df ≥ minDf). The common side is bounded by totalLines/minDf
  *      by construction (each common line owns ≥ minDf occurrences), and
  *      in practice is the tiny boilerplate vocabulary — AQE broadcasts
  *      it; the plan degrades gracefully to a keyed shuffle if a corpus
  *      is somehow all template.
  *   3. reassemble — ONE hash-aggregate by doc rebuilding the cleaned
  *      text in original line order (struct(pos, line) sort inside the
  *      aggregated array — no window, no second shuffle of the big side
  *      beyond the doc key). Docs whose every line dropped survive with
  *      empty text (left join from the per-doc totals).
  *
  * The dedup DECISION uses the normalized form (lower, trim, collapse
  * whitespace — case/spacing variants of a template line are the same
  * line); the OUTPUT keeps each surviving line verbatim.
  */
object LineDedup {

  /** The census/join key form: lower, collapse whitespace runs, trim. */
  def normalize(line: Column): Column =
    trim(regexp_replace(lower(line), "\\s+", " "))

  /** (id, pos, line, lk) — one row per line of the `linesCol` array.
    * r6: measured A/B — a spreadForCompute before the explode made
    * q_line_dedup SLOWER at sf0.1 (1.09 → 1.35 s): the explode+hash is
    * cheap next to the census/anti-join/reassemble aggregations, so the
    * extra exchange only adds stages. Left fused with the scan on purpose.
    */
  private def exploded(df: DataFrame, idCol: String, linesCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(col(linesCol)).as(Seq("pos", "line")))
      .withColumn("lk", xxhash64(normalize(col("line"))))

  /** Corpus line census: (lk, df) distinct-doc counts per normalized
    * line, exposed for threshold tuning / census reporting.
    */
  def lineDocFreq(df: DataFrame, idCol: String, linesCol: String): DataFrame =
    exploded(df, idCol, linesCol)
      .groupBy(col("lk")).agg(count_distinct(col("id")).as("df"))

  /** Drop every line appearing in ≥ `minDf` distinct documents; emit
    * (id, text_clean, n_kept, n_dropped) with surviving lines rejoined by
    * '\n' in original order.
    */
  def dropCommonLines(df: DataFrame, idCol: String, linesCol: String,
      minDf: Long): DataFrame = {
    require(minDf >= 2, s"minDf $minDf: a 1-doc line is content by definition")
    val ex = exploded(df, idCol, linesCol)
    val common = ex.groupBy(col("lk"))
      .agg(count_distinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select("lk")
    val kept = ex.join(common, Seq("lk"), "left_anti")
    val total = ex.groupBy(col("id")).agg(count(lit(1)).as("n_total"))
    val rebuilt = kept.groupBy(col("id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          e => e.getField("line")),
        "\n").as("text_clean"))
    total.join(rebuilt, Seq("id"), "left").select(
      col("id"),
      coalesce(col("text_clean"), lit("")).as("text_clean"),
      coalesce(col("n_kept"), lit(0L)).as("n_kept"),
      (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
