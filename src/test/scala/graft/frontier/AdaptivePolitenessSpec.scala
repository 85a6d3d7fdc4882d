package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the closed-form EWMA against hand-computed values, the single-
  * observation and clamp edges, resume-exactness (closed form over the log ≡
  * no carried state), and the composition into Scheduler.schedule: a slow
  * host's adaptive delay shrinks its per-round capacity.
  */
class AdaptivePolitenessSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // slow: latencies 10, 20, 40 in fetch order, decay .5 →
  //   (0.25·10 + 0.5·20 + 1·40) / 1.75 = 52.5/1.75 = 30.0
  // fast: single observation → ewma = the observation
  private val log = Seq(
    ("slow", 1L, 10.0), ("slow", 2L, 20.0), ("slow", 3L, 40.0),
    ("fast", 1L, 4.0))
    .toDF("host", "seq", "latency_ms")

  test("EWMA matches the hand-computed closed form") {
    val byHost = AdaptivePoliteness.ewmaLatency(log, "host", Seq("seq"), "latency_ms")
      .select("host", "n_obs", "ewma_ms")
      .as[(String, Long, Double)].collect()
      .map { case (h, n, e) => h -> ((n, e)) }.toMap
    assert(byHost("slow")._1 === 3L)
    assert(math.abs(byHost("slow")._2 - 30.0) < 1e-12)
    assert(byHost("fast") === ((1L, 4.0)))
  }

  test("order matters: reversing fetch order moves the EWMA toward the newer tail") {
    // same multiset, order 40, 20, 10 → (0.25·40 + 0.5·20 + 1·10)/1.75 = 17.14…
    val rev = Seq(("h", 1L, 40.0), ("h", 2L, 20.0), ("h", 3L, 10.0))
      .toDF("host", "seq", "latency_ms")
    val e = AdaptivePoliteness.ewmaLatency(rev, "host", Seq("seq"), "latency_ms")
      .select("ewma_ms").as[Double].head()
    assert(math.abs(e - 30.0 / 1.75) < 1e-12)
  }

  test("adaptiveDelay clamps at both ends and ceils in between") {
    val e = Seq(("lo", 1L, 3.0), ("mid", 1L, 123.4), ("hi", 1L, 1e9))
      .toDF("host", "n_obs", "ewma_ms")
    val got = AdaptivePoliteness.adaptiveDelay(e, headroom = 2.0,
        loMs = 100L, hiMs = 30000L)
      .select("host", "min_delay_ms").as[(String, Long)].collect().toMap
    assert(got === Map("lo" -> 100L, "mid" -> 247L, "hi" -> 30000L))
  }

  test("resume-exact: recomputing over the full log equals incremental history") {
    // closed form has no carried accumulator: EWMA over rows 1..n is a pure
    // function of the log, so a resumed job (re-reading the checkpointed log)
    // reproduces the pre-kill state bit-for-bit
    val pre = AdaptivePoliteness.ewmaLatency(log, "host", Seq("seq"), "latency_ms")
      .select("host", "ewma_ms").as[(String, Double)].collect().toSet
    val re = AdaptivePoliteness.ewmaLatency(
        log.repartition(7), "host", Seq("seq"), "latency_ms")
      .select("host", "ewma_ms").as[(String, Double)].collect().toSet
    assert(pre === re)
  }

  test("plan: ranking window and aggregate share one host-keyed Exchange") {
    val plan = AdaptivePoliteness.ewmaLatency(log, "host", Seq("seq"), "latency_ms")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 host-keyed exchange, got $exchanges\n" +
      plan.take(3000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
  }

  test("composes into Scheduler: observed-slow host gets less capacity per round") {
    // slow host ewma 30 → delay 100 (clamped lo) vs glacial ewma 5000 →
    // delay 10000 → capacity floor(60000/10000) = 6 vs slow's budget-capped 8
    val glacial = Seq(("glacial", 1L, 5000.0)).toDF("host", "seq", "latency_ms")
    val hs = AdaptivePoliteness.adaptiveDelay(
        AdaptivePoliteness.ewmaLatency(log.unionByName(glacial),
          "host", Seq("seq"), "latency_ms"))
      .withColumn("budget", lit(8))
      .select("host", "min_delay_ms", "budget")
    val queue = spark.range(0, 40).select(
      xxhash64(col("id")).as("url_hash"),
      concat(lit("u"), col("id")).as("url"),
      when(col("id") % 2 === 0, "slow").otherwise("glacial").as("host"),
      col("id").as("seq"),
      lit(1.0).as("priority"))
    val picked = Scheduler.schedule(queue, hs, roundMillis = 60000L)
      .groupBy("host").count().as[(String, Long)].collect().toMap
    assert(picked("slow") === 8L)    // budget-capped
    assert(picked("glacial") === 6L) // politeness-capped by the adaptive delay
  }
}
