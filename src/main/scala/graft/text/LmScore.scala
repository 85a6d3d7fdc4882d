package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the n-gram-perplexity filter
  * every large-scale training-data pipeline runs after the cheap heuristics
  * ([[TextAnalysis.qualityScore]]): train a bigram model ON THE CORPUS
  * ITSELF, then score each document by its average negative log-likelihood
  * under that model. Documents whose token transitions are unlike the corpus
  * (gibberish, keyword stuffing, OCR noise) score high and get filtered;
  * fluent text scores low. Add-k smoothing keeps unseen-bigram mass finite
  * and — unlike backoff models — makes the whole computation closed-form
  * over two count tables, so it replays exactly in external SQL (the
  * DuckDB oracle recomputes counts, smoothing, and the per-doc average).
  *
  *   p(v|u) = (C(u,v) + k) / (C(u) + k·|V|)
  *   nll(doc) = mean over its bigrams of −ln p(v|u)
  *
  * Shape for 100 TB: tokenization and bigram extraction are pure column
  * expressions (codegen, scan-speed); the two count tables are single
  * hash-aggregates with map-side combine; scoring is two equi-joins on the
  * gram keys. Unigram frequencies are Zipfian, so the C(u) join key is
  * skewed by construction — AQE's skew-join split handles the hot keys
  * ("the", "a") without salting because the build rows are 1-per-key. The
  * bigram stream is materialized once (`localCheckpoint`) because it feeds
  * both count tables and the scoring join. At real corpus scale you prune
  * the count tables with a minimum-count floor (tail grams collapse into
  * the smoothing term anyway) — exposed as `minCount`, default off so the
  * default semantics stay exactly oracle-replayable.
  */
object LmScore {

  /** (id, u, v) bigram stream; documents with < 2 tokens contribute none.
    * r6: measured A/B — a spreadForCompute here made the operator SLOWER
    * at sf0.1 (0.55 → 0.71 s): the bigram explode is cheap next to the
    * count-table aggregations, so the extra exchange only adds a stage.
    * Left fused with the scan on purpose.
    */
  def docBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("u"),
            element_at(col("t"), i + 1).as("v")))).as("uv"))
      .select(col("id"), col("uv.u").as("u"), col("uv.v").as("v"))

  /** Per-document average negative log-likelihood under the corpus's own
    * add-k bigram model: (id, n_bigrams, avg_nll). Lower = more fluent
    * relative to the corpus. Documents with < 2 tokens are absent.
    *
    * @param k add-k smoothing constant (> 0)
    * @param minCount drop count-table entries below this floor (0 = exact;
    *        any floor changes scores of affected grams to the unseen path,
    *        i.e. counts prune to 0, NOT to approximate values)
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5, minCount: Long = 0L): DataFrame = {
    require(k > 0.0, s"add-k smoothing needs k > 0, got $k")
    val b = docBigrams(df, idCol, textCol).localCheckpoint(true)
    val c2 = b.groupBy("u", "v").agg(count(lit(1)).cast("double").as("c2"))
      .filter(col("c2") >= minCount)
    val c1 = b.groupBy("u").agg(count(lit(1)).cast("double").as("c1"))
      .filter(col("c1") >= minCount)
    // |V| over every tokenized document (including 1-token docs): a 1-row
    // aggregate carried in-plan via broadcast, not a driver scalar
    val vocab = df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).cast("double").as("vs"))
    b.join(c2, Seq("u", "v"), "left")
      .join(c1, Seq("u"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        -log((coalesce(col("c2"), lit(0.0)) + k) /
          (coalesce(col("c1"), lit(0.0)) + col("vs") * k)))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), avg(col("nll")).as("avg_nll"))
  }
}
