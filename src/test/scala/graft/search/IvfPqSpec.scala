package graft.search

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the IVFADC composition: the index carries codes only (no raw
  * vectors), full probe + full shortlist degenerates to exact brute
  * force, a partial probe still finds a planted cluster around the query,
  * results are deterministic, and the plans keep the scan pruned +
  * shuffle-free with the re-rank broadcasting the shortlist.
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dim = 16
  private val n = 240L

  // four DIRECTION-separated blobs (blob b peaks on dims ≡ b mod 4 — the
  // coarse quantizer assigns by cosine, so cells must differ in direction,
  // not just offset) + 5 planted near-copies of the query point (blob 0's
  // center) — the planted rows land in the query's coarse cell, so even
  // nprobe=1 must surface them
  private def mk(i: Long): Array[Double] = {
    val r = new scala.util.Random(i)
    Array.tabulate(dim)(d =>
      (if (d % 4 == (i % 4).toInt) 6.0 else 0.0) + r.nextGaussian() * 0.4)
  }
  private val query: Array[Double] =
    Array.tabulate(dim)(d => if (d % 4 == 0) 6.0 else 0.0)
  private lazy val rows = {
    val noise = (0L until n).map(i => (i, mk(i)))
    val planted = (1000L until 1005L).map { i =>
      val r = new scala.util.Random(i)
      (i, query.map(_ + r.nextGaussian() * 0.01))
    }
    (noise ++ planted).toDF("id", "vec")
  }

  private lazy val idx =
    IvfPq.build(spark, rows, "id", "vec", nlist = 4, m = 4, ksub = 8, iters = 3)

  private def exactTopK(k: Int): Seq[(Long, Double)] =
    rows.as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        (id, v.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(k).toSeq

  test("index stores (id, cell, codes) only — never the raw vector") {
    assert(idx.codes.columns.toSeq === Seq("id", "cell", "codes"))
    val one = idx.codes.limit(1).collect()(0)
    assert(one.getSeq[Int](2).length === 4)
  }

  test("full probe + full shortlist degenerates to exact brute force") {
    val got = IvfPq.search(idx, rows, "id", "vec", query, k = 10,
      nprobe = 4, shortlist = 245).as[(Long, Double)].collect()
    got.zip(exactTopK(10)).foreach { case ((gi, gd), (ei, ed)) =>
      assert(gi === ei)
      assert(math.abs(gd - ed) < 1e-6)
    }
  }

  test("nprobe=1 still finds the planted cluster in the query's own cell") {
    val got = IvfPq.search(idx, rows, "id", "vec", query, k = 5,
      nprobe = 1, shortlist = 20).select("id").as[Long].collect().toSet
    assert(got.count(_ >= 1000L) === 5, s"top-5 was $got")
  }

  test("search is deterministic") {
    val a = IvfPq.search(idx, rows, "id", "vec", query, 10, 2, 30)
      .as[(Long, Double)].collect().toSeq
    val b = IvfPq.search(idx, rows, "id", "vec", query, 10, 2, 30)
      .as[(Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("plans: probed-cell ADC scan is shuffle-free; re-rank broadcasts") {
    val plan = IvfPq.search(idx, rows, "id", "vec", query, 5, 2, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(2500))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2500))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2500))
  }
}
