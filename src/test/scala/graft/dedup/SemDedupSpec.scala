package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins SemDeDup (cluster-then-within-cluster cosine prune) on a seeded
  * vector corpus with planted exact twins and a near-twin, against a
  * brute-force exact-pair oracle computed in plain Scala.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dim = 16

  /** 80 seeded random unit-ish vectors; ids 1000+i are EXACT twins of i for
    * i < 8; id 2000 is a near-twin of id 0 (one coordinate nudged — cosine
    * just under 1, well above 0.95 on this data).
    */
  lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 80).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    val twins = base.take(8).map { case (i, v) => (1000L + i, v.clone()) }
    val near = {
      val v = base.head._2.clone(); v(0) += 0.05
      Seq((2000L, v))
    }
    base ++ twins ++ near
  }
  lazy val df = corpus.toDF("vec_id", "embedding")

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    (0 until dim).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / math.sqrt(na * nb)
  }

  /** All (id1 < id2) pairs with cosine ≥ t, by brute force. */
  private def exactPairs(t: Double): Set[(Long, Long)] =
    (for {
      (i, a) <- corpus; (j, b) <- corpus
      if i < j && cos(a, b) >= t
    } yield (i, j)).toSet

  test("soundness: every emitted pair really has cosine >= threshold") {
    val pairs = SemDedup.semanticNearDups(spark, df, "vec_id", "embedding",
      nlist = 8, minCosine = 0.95).collect()
    val byId = corpus.toMap
    pairs.foreach { r =>
      val c = cos(byId(r.getLong(0)), byId(r.getLong(1)))
      assert(c >= 0.95, s"pair (${r.getLong(0)}, ${r.getLong(1)}) cosine $c")
      assert(math.abs(c - r.getDouble(2)) < 1e-9)
    }
  }

  test("recall on identical twins is 1: same vector => same cell, always") {
    val pairs = SemDedup.semanticNearDups(spark, df, "vec_id", "embedding",
      nlist = 8, minCosine = 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    (0 until 8).foreach { i =>
      assert(pairs.contains((i.toLong, 1000L + i)), s"missed exact twin $i")
    }
  }

  test("nlist=1 degenerates to capped brute force: pairs == exact pair set") {
    val got = SemDedup.semanticNearDups(spark, df, "vec_id", "embedding",
      nlist = 1, minCosine = 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got === exactPairs(0.95)) // includes the planted near-twin (0, 2000)
    assert(got.contains((0L, 2000L)))
  }

  test("survivors: min id per cluster kept, singletons untouched") {
    val surv = SemDedup.semanticSurvivors(spark, df, "vec_id", "embedding",
      nlist = 1, minCosine = 0.95)
      .select("vec_id").as[Long].collect().toSet
    // twins 1000+i and the near-twin 2000 drop; every base id survives
    assert(surv === (0 until 80).map(_.toLong).toSet)
  }

  test("oversize cells are excluded observably, small-cell pairs survive") {
    // maxCell below the largest cell population forces at least one drop
    val sizes = SemDedup.semanticOversizeCells(spark, df, "vec_id", "embedding",
      nlist = 8, maxCell = 10L).collect()
    assert(sizes.nonEmpty, "expected at least one >10-row cell on 89 rows / 8 cells")
    val capped = SemDedup.semanticNearDups(spark, df, "vec_id", "embedding",
      nlist = 8, minCosine = 0.95, maxCell = 10L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val uncapped = SemDedup.semanticNearDups(spark, df, "vec_id", "embedding",
      nlist = 8, minCosine = 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped))
    // maxCell=1 drops EVERY >=2-row cell: the cap provably does work
    val allCapped = SemDedup.semanticNearDups(spark, df, "vec_id", "embedding",
      nlist = 8, minCosine = 0.95, maxCell = 1L)
      .count()
    assert(allCapped === 0L)
    assert(uncapped.nonEmpty)
  }

  test("plan: no cartesian product; candidate join carries no vector column") {
    val pairs = SemDedup.semanticNearDups(spark, df, "vec_id", "embedding",
      nlist = 8, minCosine = 0.95)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
