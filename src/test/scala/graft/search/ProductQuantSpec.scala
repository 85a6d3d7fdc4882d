package graft.search

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins PQ end-to-end: codes in range and deterministic, training reduces
  * quantization error below the init codebook's, ADC distance A/Bs against
  * a plain-Scala recompute, a planted cluster around the query wins the
  * ADC top-k over far noise, and the encode/search plans stay shuffle-free.
  */
class ProductQuantSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val ksub = 8

  // two well-separated blobs + 5 planted near-copies of the query point
  private def mk(i: Long): Array[Double] = {
    val r = new scala.util.Random(i)
    val base = if (i % 2 == 0) 0.0 else 10.0
    Array.fill(dim)(base + r.nextGaussian() * 0.5)
  }
  private val query: Array[Double] = Array.fill(dim)(0.0)
  private lazy val rows = {
    val noise = (0L until 200L).map(i => (i, mk(i)))
    val planted = (1000L until 1005L).map { i =>
      val r = new scala.util.Random(i)
      (i, query.map(_ + r.nextGaussian() * 0.01))
    }
    (noise ++ planted).toDF("id", "vec")
  }

  private lazy val cb = ProductQuant.train(spark, rows, "id", "vec", m, ksub, iters = 3)
  private lazy val codes = ProductQuant.encode(rows, "id", "vec", cb)

  test("codes are m per row, in [0, ksub), deterministic") {
    val got = codes.select(col("id"), col("codes")).as[(Long, Seq[Int])].collect()
    assert(got.length === 205)
    got.foreach { case (_, cs) =>
      assert(cs.length === m)
      cs.foreach(c => assert(c >= 0 && c < ksub))
    }
    val again = ProductQuant.encode(rows, "id", "vec", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(got.toMap === again)
  }

  test("training reduces quantization error vs the init codebook") {
    def qerr(c: ProductQuant.PqCodebook): Double = {
      val enc = ProductQuant.encode(rows, "id", "vec", c)
        .join(rows, "id").as[(Long, Seq[Int], Seq[Double])].collect()
      enc.map { case (_, cs, v) =>
        (0 until c.m).map { j =>
          val cent = c.codebook(j)(cs(j))
          (0 until c.dsub).map { i =>
            val d = v(j * c.dsub + i) - cent(i); d * d
          }.sum
        }.sum
      }.sum / enc.length
    }
    val init = ProductQuant.train(spark, rows, "id", "vec", m, ksub, iters = 1)
    val trained = ProductQuant.train(spark, rows, "id", "vec", m, ksub, iters = 5)
    assert(qerr(trained) <= qerr(init) + 1e-9,
      s"trained ${qerr(trained)} vs init ${qerr(init)}")
  }

  test("ADC distance equals the plain-Scala table-lookup recompute") {
    val dt = ProductQuant.distanceTable(cb, query)
    val got = ProductQuant.searchAdc(codes, cb, query, k = 205)
      .as[(Long, Double)].collect().toMap
    val exp = codes.as[(Long, Seq[Int])].collect().toMap
    exp.foreach { case (id, cs) =>
      val d = (0 until m).map(j => dt(j * ksub + cs(j))).sum
      assert(math.abs(got(id) - BigDecimal(d).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6, s"id=$id")
    }
  }

  test("planted near-copies of the query dominate the ADC top-k") {
    val top = ProductQuant.searchAdc(codes, cb, query, k = 5)
      .select("id").as[Long].collect().toSet
    // the 5 planted ids quantize to the query's own cell chain; far noise
    // (blob at 10.0) and even 0-blob noise (sigma 0.5 vs 0.01) rank below
    assert(top.count(_ >= 1000L) >= 4, s"top-5 was $top")
  }

  test("rerank with a full-table shortlist equals exact brute force") {
    val got = ProductQuant.searchAdcRerank(codes, rows, "id", "vec", cb,
      query, k = 10, shortlist = 205).as[(Long, Double)].collect()
    val exp = rows.as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        (id, v.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(10)
    got.zip(exp).foreach { case ((gi, gd), (ei, ed)) =>
      assert(gi === ei)
      assert(math.abs(gd - ed) < 1e-6)
    }
  }

  test("rerank plan: shortlist broadcast-joins back, big side never shuffles") {
    val plan = ProductQuant.searchAdcRerank(codes, rows, "id", "vec", cb,
      query, k = 5, shortlist = 20).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }

  test("plans: encode and ADC search are shuffle-free scans") {
    val pe = codes.queryExecution.executedPlan.toString
    assert(!pe.contains("Exchange"), pe.take(1500))
    val ps = ProductQuant.searchAdc(codes, cb, query, k = 5)
      .queryExecution.executedPlan.toString
    assert(ps.contains("TakeOrderedAndProject"), ps.take(1500))
    assert(!ps.contains("Exchange hashpartitioning"), ps.take(1500))
  }
}
