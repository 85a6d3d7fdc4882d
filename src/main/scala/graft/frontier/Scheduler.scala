package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host politeness-aware priority scheduling — the Spark restatement of
  * the reference's bounded-concurrency-but-ordered-commit task chain
  * (/root/reference/syncronizer/synchronizer.go:14-36) plus its poll-interval
  * politeness tick (/root/reference/crawler/crawler.go:42-51).
  *
  * Semantics per batch round:
  *   - robots gate: a frontier entry whose path matches any of its host's
  *     disallow prefixes never schedules (the per-sink predicate analog,
  *     /root/reference/crawler/blocks.go:202-228);
  *   - per-host capacity = min(budget, roundMillis / min_delay_ms) — the
  *     politeness budget;
  *   - per-host order = (priority desc, seq asc): strict, deterministic, the
  *     analog of the strictly ascending block walk
  *     (/root/reference/crawler/blocks.go:60-63);
  *   - cross-host interleave pinned by (priority desc, seq asc,
  *     xxhash64(host)) so output is independent of parallelism (SURVEY.md §7
  *     hard part 1).
  *
  * Scale shape: top-k per host is computed in TWO phases so a hot host
  * (Zipf head) never concentrates on one task before reduction — phase 1
  * ranks within (host, salt) groups and keeps ≤ capacity rows per group;
  * phase 2 ranks the ≤ capacity·SALTS survivors per host. Both phases are
  * window row_numbers; the phase-1 key includes the salt so the shuffle
  * spreads a hot host over SALTS reducers (north_rule: "skew from hot hosts
  * handled by explicit key salting").
  */
object Scheduler {

  val Salts = 16

  /** Column expr: does `path` fall under any disallow prefix in `rules`? */
  def robotsDisallowed(path: Column, rules: Column): Column =
    exists(rules, rule => startswith(path, rule))

  /** Per-host fetch capacity for one round of `roundMillis`. */
  def capacity(budget: Column, minDelayMs: Column, roundMillis: Long): Column =
    least(budget, floor(lit(roundMillis) / greatest(minDelayMs, lit(1L))))
      .cast("int")

  /** Select this round's fetch set.
    *
    * @param queue     frontier entries: url_hash, url, host, seq, priority, path
    * @param hostState host, robots_disallow, min_delay_ms, budget — small
    *                  (one row per host) → broadcast join side
    * @return scheduled rows with host_rank (1-based per-host commit order)
    */
  def schedule(queue: DataFrame, hostState: DataFrame, roundMillis: Long): DataFrame = {
    val gated = queue
      .join(broadcast(hostState), Seq("host"), "inner")
      .filter(!robotsDisallowed(col("path"), col("robots_disallow")))
      .withColumn("cap", capacity(col("budget"), col("min_delay_ms"), roundMillis))
      .drop("robots_disallow", "min_delay_ms", "budget")

    // Only the RANK KEYS ride the two window shuffles: the wide payload
    // (url, path, ...) would multiply shuffle bytes ~5x for no reason —
    // winners are recovered afterwards by a broadcast join on url_hash
    // (≤ Σ capacity rows, a few MB even with thousands of hosts).
    val narrow = gated.select(
      col("host"), col("url_hash"), col("priority"), col("seq"), col("cap"))

    // phase 1: salted local top-k (bounds any single partition's rank input)
    val salted = narrow.withColumn("salt", pmod(xxhash64(col("url_hash")), lit(Salts)))
    val w1 = Window.partitionBy(col("host"), col("salt"))
      .orderBy(col("priority").desc, col("seq").asc)
    val local = salted
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= col("cap"))
      .drop("r1", "salt")

    // phase 2: exact per-host top-k over the pruned survivors
    val w2 = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("seq").asc)
    val winners = local
      .withColumn("host_rank", row_number().over(w2))
      .filter(col("host_rank") <= col("cap"))
      .select(col("url_hash"), col("host_rank"))

    gated.drop("cap").join(broadcast(winners), Seq("url_hash"))
  }

  /** The pinned global commit-order sort key (FIXTURES.md §3): use for
    * writing/ comparing ordered output without forcing a single-partition
    * global row_number.
    */
  def globalOrder: Seq[Column] =
    Seq(col("priority").desc, col("seq").asc, xxhash64(col("host")).asc)
}
