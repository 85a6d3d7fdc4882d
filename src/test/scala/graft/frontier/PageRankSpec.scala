package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(n: Int, edges: Seq[(Long, Long)], iters: Int = 5,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (0L until n).toDF("id")
    val e = edges.toDF("src", "dst")
    PageRank.pagerank(nodes, e, iters, d)
      .as[(Long, Double)].collect().toMap
  }

  /** Independent plain-Scala oracle: same fixed-iteration semantics,
    * dangling mass redistributed uniformly, multiset edges.
    */
  private def ref(n: Int, edges: Seq[(Long, Long)], iters: Int = 5,
      d: Double = 0.85): Map[Long, Double] = {
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toDouble }
    var rank = (0L until n).map(i => i -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val mass = (0L until n).filterNot(deg.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      edges.foreach { case (u, v) => contrib(v) += rank(u) / deg(u) }
      rank = (0L until n).map(i =>
        i -> ((1 - d) / n + d * (contrib(i) + mass / n))).toMap
    }
    rank
  }

  test("directed cycle stays exactly uniform") {
    val n = 12
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    val got = run(n, edges)
    got.values.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12))
  }

  test("ranks sum to 1 with danglers present (mass redistribution on)") {
    // nodes 6..9 have no out-edges
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 6L), (4L, 7L), (5L, 8L), (0L, 9L))
    val got = run(10, edges)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    val want = ref(10, edges)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, s"node $id") }
  }

  test("matches the independent oracle on a random multigraph with self-loops") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val got = run(n, edges, iters = 6)
    val want = ref(n, edges, iters = 6)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, s"node $id") }
  }

  test("hub of a star outranks its leaves; parallel edges weight proportionally") {
    // leaves 1..6 each point at hub 0; hub points back at leaf 1
    val star = (1L to 6L).map(i => (i, 0L)) :+ ((0L, 1L))
    val s = run(7, star)
    assert((1L to 6L).forall(i => s(0L) > s(i)))
    // node 0 sends two edges to 1 and one to 2: its 1/3 of rank splits 2:1,
    // so after one iteration m(1) − m(2) = d · (1/3) · (2/3 − 1/3)
    val multi = Seq((0L, 1L), (0L, 1L), (0L, 2L))
    val m = run(3, multi, iters = 1)
    assert(math.abs((m(1L) - m(2L)) - 0.85 / 9.0) < 1e-12)
  }

  test("composes with the scheduler: rank-priority frontier drains hubs first") {
    // star: leaves 1..6 -> hub 0, hub -> leaf 1; rank(0) > rank(1) > rest
    val nodes = (0L until 7L).toDF("id")
    val edges = ((1L to 6L).map(i => (i, 0L)) :+ ((0L, 1L))).toDF("src", "dst")
    val pr = PageRank.pagerank(nodes, edges)
    // frontier: one URL per node on one host, priority = rank scaled to long
    // (the scheduler contract orders by priority desc, seq asc)
    val queue = pr.select(
      org.apache.spark.sql.functions.lit("h1.test").as("host"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("http://h1.test/n/"),
        org.apache.spark.sql.functions.col("id")).as("url"),
      org.apache.spark.sql.functions.col("id").as("url_hash"),
      org.apache.spark.sql.functions.col("id").as("seq"),
      (org.apache.spark.sql.functions.col("rank") * 1e12).cast("long").as("priority"))
    val hs = Seq(("h1.test", Seq.empty[String], 100L, 2))
      .toDF("host", "robots_disallow", "min_delay_ms", "budget")
    val got = Scheduler.schedule(queue, hs, 10000L)
      .orderBy(org.apache.spark.sql.functions.col("host_rank"))
      .select("url_hash").as[Long].collect().toSeq
    assert(got === Seq(0L, 1L)) // hub first, then its best-ranked leaf
  }
}
