package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive per-host politeness from OBSERVED fetch latency — the companion
  * of the robots `Crawl-delay` link: where [[RobotsTxt]] sets the delay a
  * host *asks for*, this derives the delay its server *demonstrates it
  * needs*, the way production crawlers back off hosts whose response times
  * climb (the analog of the reference's fixed poll interval,
  * /root/reference/crawler/crawler.go:42-51, made data-driven).
  *
  * The estimator is the bias-corrected EWMA in closed form: with fetches of
  * a host ranked rn = 1..n in fetch order,
  *
  *   ewma = Σⱼ decay^(n−j)·latencyⱼ / Σⱼ decay^(n−j)
  *
  * — newest observation weight 1, each older one decayed. The closed form
  * (rather than the recursive update) is what makes the operator (a) one
  * columnar pass, (b) exactly replayable in external SQL, and (c) exact on
  * resume: recomputing over the checkpointed fetch log gives bit-identical
  * state, no carried accumulator. decay = 0.5 by default because powers of
  * two are exact IEEE doubles, so the weights replay bit-for-bit in any
  * engine.
  *
  * Scale shape: one shuffle on the host key — the ranking window and the
  * final aggregate share hashpartitioning(host), so Catalyst plans a single
  * Exchange; weights underflow to +0 beyond ~1074 halvings, so arbitrarily
  * long per-host histories stay finite (and a caller thinning the log to
  * the last K fetches per host changes nothing material: older weights are
  * already ≈ 0).
  */
object AdaptivePoliteness {

  /** Per-host EWMA of `latencyCol` ordered by `orderCols` (must totally
    * order each host's fetches — include a unique tiebreak column).
    * Returns (hostCol, n_obs, ewma_ms).
    */
  def ewmaLatency(fetchLog: DataFrame, hostCol: String, orderCols: Seq[String],
      latencyCol: String, decay: Double = 0.5): DataFrame = {
    require(decay > 0.0 && decay < 1.0, s"decay $decay outside (0,1)")
    val part = Window.partitionBy(col(hostCol))
    val ord = part.orderBy(orderCols.map(col): _*)
    val weight = pow(lit(decay), col("__n") - col("__rn"))
    fetchLog
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(part))
      .groupBy(col(hostCol))
      .agg(max(col("__n")).as("n_obs"),
        (sum(col(latencyCol) * weight) / sum(weight)).as("ewma_ms"))
  }

  /** Turns the EWMA into the scheduler's `min_delay_ms` column:
    * clamp(⌈headroom·ewma⌉, loMs, hiMs). The output joins
    * [[Scheduler.schedule]]'s host-state contract directly (host,
    * min_delay_ms); a caller merges it with the robots Crawl-delay by
    * taking the per-host greatest of the two.
    */
  def adaptiveDelay(ewma: DataFrame, headroom: Double = 2.0,
      loMs: Long = 100L, hiMs: Long = 30000L): DataFrame = {
    require(loMs <= hiMs, s"loMs $loMs > hiMs $hiMs")
    ewma.withColumn("min_delay_ms",
      least(lit(hiMs), greatest(lit(loMs),
        ceil(col("ewma_ms") * lit(headroom)))))
  }
}
