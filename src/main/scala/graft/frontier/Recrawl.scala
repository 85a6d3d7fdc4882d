package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recrawl scheduling — per-URL change-rate estimation over fetch history.
  *
  * The reference polls its single upstream on a FIXED interval chosen by the
  * operator (`/root/reference/README.md:39` — "interval ≈ 0.5 × target block
  * time"; `/root/reference/config.json.example`). A web frontier has 10^10
  * sources with wildly different change rates, so the fixed interval
  * generalizes to a per-URL estimate learned from history: the classic
  * Cho & Garcia-Molina Poisson estimator (Estimating Frequency of Change,
  * ACM TOIT 2003). For a URL fetched n times at average gap Δ̄ with X
  * observed content changes across its n−1 consecutive fetch pairs,
  *
  *   λ̂ = −ln((n−1 − X + 0.5) / (n−1 + 0.5)) / Δ̄
  *
  * (the +0.5 is the paper's bias correction, which also keeps the estimator
  * finite when every interval changed). The scheduler then revisits a URL
  * when its expected-change mass λ̂·(now − last_fetch) crosses a budget
  * threshold — [[nextDue]].
  *
  * Scale shape: one window (lag of the content fingerprint) and one
  * aggregate, BOTH keyed by the URL column — Catalyst plans a single
  * Exchange and reuses the hash partitioning for the aggregate, and the
  * partial aggregation is map-side. No joins, no driver state; history at
  * 10^10 URLs × k fetches streams through one shuffle of narrow rows
  * (url, seq, fingerprint).
  */
object Recrawl {

  /** Per-URL change-rate estimate from a fetch-history table.
    *
    * @param fetches one row per fetch: a URL key, a monotone per-URL
    *                sequence column (fetch time or a logical clock), and a
    *                content fingerprint column (hash of the fetched body)
    * @param lambdaScale output λ̂ is multiplied by this (e.g. 86400 turns
    *                a per-second rate into changes/day); keeps the reported
    *                figure in a human scale
    * Output: (url, n_fetches, n_changes, lambda_k) for URLs with ≥ 2
    * fetches — one fetch carries no change information.
    */
  def changeRate(fetches: DataFrame, urlCol: String, seqCol: String,
      fpCol: String, lambdaScale: Double = 1000.0): DataFrame = {
    val w = Window.partitionBy(col(urlCol)).orderBy(col(seqCol))
    val intervals = col("n_fetches") - 1
    fetches
      .withColumn("__prev_fp", lag(col(fpCol), 1).over(w))
      .groupBy(col(urlCol))
      .agg(
        count(lit(1)).as("n_fetches"),
        sum(when(col("__prev_fp").isNotNull && col("__prev_fp") =!= col(fpCol), 1L)
          .otherwise(0L)).as("n_changes"),
        (max(col(seqCol)) - min(col(seqCol))).cast("double").as("__span"))
      .filter(col("n_fetches") >= 2)
      // + 0.0 normalizes the X=0 case: -ln(1) is IEEE -0.0, which must not
      // hash differently from 0.0 in the driver's value compare
      .withColumn("lambda_k", round(
        -log(((intervals - col("n_changes")).cast("double") + 0.5) /
          (intervals.cast("double") + 0.5)) /
          (col("__span") / intervals.cast("double")) * lambdaScale, 4) + lit(0.0))
      .select(col(urlCol), col("n_fetches"), col("n_changes"), col("lambda_k"))
  }

  /** URLs due for a revisit: expected accumulated change mass
    * λ̂·(now − last_seq) ≥ `threshold`. Joins the rate table back to the
    * latest-fetch row on the URL key — the same partitioning as
    * [[changeRate]]'s output, so the join reuses the shuffle.
    */
  def nextDue(fetches: DataFrame, rates: DataFrame, urlCol: String,
      seqCol: String, now: Double, threshold: Double = 1.0,
      lambdaScale: Double = 1000.0): DataFrame = {
    val last = fetches.groupBy(col(urlCol)).agg(max(col(seqCol)).as("last_seq"))
    last.join(rates, Seq(urlCol))
      .withColumn("change_mass",
        col("lambda_k") / lambdaScale * (lit(now) - col("last_seq")))
      .filter(col("change_mass") >= threshold)
      .select(col(urlCol), col("last_seq"), col("lambda_k"), col("change_mass"))
  }
}
