package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Cho–Garcia-Molina estimator in closed form: hand-computed λ̂ for
  * a changing URL, exactly 0 for a static one (including the IEEE -0.0
  * normalization), the every-interval-changed bias-correction case, the
  * single-fetch filter, and the nextDue threshold join.
  */
class RecrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // a: 4 fetches, 1 change in 3 intervals, avg gap 10
  //    λ̂·1000 = -ln((3-1+0.5)/(3+0.5))/10 ·1000 = ln(1.4)·100 = 33.6472
  // b: 3 fetches, never changes → λ̂ = 0 exactly
  // c: 3 fetches, changes every interval, avg gap 5
  //    λ̂·1000 = -ln(0.5/2.5)/5 ·1000 = ln(5)·200 = 321.8876
  // d: 1 fetch → carries no change information, filtered out
  private val fetches = Seq(
    ("a", 0L, 1L), ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 2L),
    ("b", 0L, 7L), ("b", 4L, 7L), ("b", 9L, 7L),
    ("c", 0L, 1L), ("c", 5L, 2L), ("c", 10L, 3L),
    ("d", 3L, 9L))
    .toDF("url", "seq", "fp")

  test("changeRate matches the hand-computed estimator") {
    val got = Recrawl.changeRate(fetches, "url", "seq", "fp")
      .select("url", "n_fetches", "n_changes", "lambda_k")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", 4L, 1L, 33.6472),
      ("b", 3L, 0L, 0.0),
      ("c", 3L, 2L, 321.8876)))
  }

  test("static URL yields positive zero, not IEEE -0.0") {
    val lk = Recrawl.changeRate(fetches, "url", "seq", "fp")
      .filter(col("url") === "b").select("lambda_k").as[Double].collect().head
    assert(java.lang.Double.doubleToRawLongBits(lk) === 0L)
  }

  test("nextDue flags exactly the URLs whose change mass crosses the threshold") {
    val rates = Recrawl.changeRate(fetches, "url", "seq", "fp")
    // at now=100: a → 33.6472/1000·70 = 2.36 ≥ 1 due; b → 0 not due;
    // c → 321.8876/1000·90 = 28.97 due
    val due = Recrawl.nextDue(fetches.filter(col("url") =!= "d"), rates,
      "url", "seq", now = 100.0, threshold = 1.0)
      .select("url").as[String].collect().toSet
    assert(due === Set("a", "c"))
    // a tight threshold excludes a but keeps c
    val dueTight = Recrawl.nextDue(fetches.filter(col("url") =!= "d"), rates,
      "url", "seq", now = 100.0, threshold = 10.0)
      .select("url").as[String].collect().toSet
    assert(dueTight === Set("c"))
  }

  test("change mass composes as scheduler priority (rank-as-priority move)") {
    // Due URLs re-enter the frontier queue with priority = change mass, so
    // under a capacity-1 politeness budget the host fetches its most
    // change-starved URL first — c (mass 28.97) over a (mass 2.36).
    val rates = Recrawl.changeRate(fetches, "url", "seq", "fp")
    val due = Recrawl.nextDue(fetches.filter(col("url") =!= "d"), rates,
      "url", "seq", now = 100.0, threshold = 1.0)
    val queue = due.select(
      xxhash64(col("url")).as("url_hash"),
      col("url"),
      lit("host1").as("host"),
      col("last_seq").as("seq"),
      col("change_mass").as("priority"))
    val hostState = Seq(("host1", 1000L, 1)).toDF("host", "min_delay_ms", "budget")
    val picked = Scheduler.schedule(queue, hostState, roundMillis = 60000L)
      .select("url").as[String].collect().toSeq
    assert(picked === Seq("c"))
  }
}
