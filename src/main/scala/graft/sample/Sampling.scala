package graft.sample

import graft.functions.GraftExpressions.mix64_salted
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixture operators for assembling a training
  * set from a crawled corpus — the step after dedup/quality filtering where
  * a pipeline thins each stratum (language, domain, source) to a target
  * rate or re-weights strata by temperature (the multilingual-LM move:
  * sample stratum s with probability ∝ n_s^α, α < 1 upweights the tail).
  *
  * Every operator keys on the salted splitmix64 of the row id
  * ([[graft.functions.GraftExpressions.Mix64Salted]]):
  *  - deterministic: the same (id, salt) always lands in the same bucket, so
  *    a re-run (or an incremental run over new partitions) selects the same
  *    rows — no RNG state, no `rand()` non-reproducibility;
  *  - externally verifiable: the hash replays in plain SQL (the mix64 CTE
  *    chain), so the sample MEMBERSHIP itself is oracle-checkable
  *    row-for-row, not just its size;
  *  - scale shape: [[stratifiedSample]] is a pure filter (no shuffle, full
  *    pushdown-friendly); [[uniformPerStratum]] shuffles once on the stratum
  *    key; [[temperatureWeights]] is one hash-aggregate plus a broadcast of
  *    the 1-row normalizer.
  */
object Sampling {

  /** Sampling resolution: rates are quantized to 1/Res (1e-4). */
  val Res = 10000

  /** Deterministic bucket in [0, Res): floorMod(mix64(id ^ salt'), Res). */
  def hashBucket(id: Column, salt: Long): Column =
    pmod(mix64_salted(id, salt), lit(Res.toLong))

  /** Per-stratum Bernoulli sample at deterministic, externally-replayable
    * membership: row survives iff its hash bucket < rate(stratum)·Res.
    * `rates` maps stratum values to keep-rates in [0,1] (resolution 1e-4);
    * strata not listed keep `defaultRate`. A pure filter — no shuffle, and
    * Catalyst pushes it below column pruning, so at 100 TB this is a scan
    * that emits only the sample.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: Long = 7L): DataFrame = {
    def toThreshold(r: Double): Long = {
      require(r >= 0.0 && r <= 1.0, s"rate $r outside [0,1]")
      math.round(r * Res)
    }
    val threshold = rates.foldLeft(lit(toThreshold(defaultRate))) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(toThreshold(v))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < threshold)
  }

  /** Uniform-without-replacement k rows per stratum, deterministic: rank
    * rows within each stratum by (hash, id) and keep the first k. One
    * shuffle on the stratum key; the per-stratum sort is the same shape as
    * any top-k window (TakeOrdered per group). For strata large enough that
    * sorting them is the bottleneck, pre-thin with [[stratifiedSample]] at a
    * rate that still guarantees ≥ k expected survivors, then rank the
    * survivors — the composed operator stays deterministic because both
    * stages key on the same hash family (different salts).
    */
  def uniformPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, salt: Long = 7L): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(mix64_salted(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Temperature-based mixture weights per stratum: w_s = n_s^α / Σ n_s^α.
    * α = 0.5 (the default) is square-root temperature — chosen over an
    * arbitrary exponent because sqrt is correctly rounded IEEE in every
    * engine, so the weights replay bit-exactly in an external oracle. One
    * hash-aggregate; the normalizer is a broadcast 1-row cross join (the
    * plan-native scalar-subquery shape), so nothing lands on the driver.
    */
  def temperatureWeights(df: DataFrame, stratumCol: String,
      alpha: Double = 0.5): DataFrame = {
    def tempered(n: Column): Column =
      if (alpha == 0.5) sqrt(n.cast("double")) else pow(n.cast("double"), alpha)
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val z = counts.agg(sum(tempered(col("n"))).as("z"))
    counts.crossJoin(broadcast(z))
      .select(col(stratumCol), col("n"),
        round(tempered(col("n")) / col("z"), 6).as("weight"))
  }
}
