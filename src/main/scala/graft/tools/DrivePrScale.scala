package graft.tools

import org.apache.spark.sql.functions._

/** Scale evidence for `frontier.PageRank`: the same graph shape at two edge
  * counts, timing the full 5-iteration power run. The graph mixes the hard
  * regimes a web link graph has — uniform random edges, one hot AUTHORITY
  * (2% of all edges point at node 0: a skewed groupBy(dst) key, absorbed by
  * map-side partial aggregation) and one hot HUB (node 1 emits 100k
  * out-edges: a skewed src join key, split by AQE). Usage:
  *   sbt 'runMain graft.tools.DrivePrScale 8 1000000,10000000'
  */
object DrivePrScale {
  def main(a: Array[String]): Unit = {
    val cores = a.headOption.map(_.toInt).getOrElse(8)
    val sizes = a.drop(1).headOption.map(_.split(",").map(_.toLong))
      .getOrElse(Array(1000000L, 10000000L))
    val spark = graft.GraftSession.get(cores)

    sizes.foreach { m =>
      val n = (m * 4) / 5
      val par = spark.sparkContext.defaultParallelism
      val rand = spark.range(0, m, 1, par).select(
        pmod(xxhash64(col("id"), lit(1)), lit(n)).as("src"),
        // 2% of edges redirect to the authority node 0
        when(pmod(xxhash64(col("id"), lit(3)), lit(50)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(n))).as("dst"))
      val hub = spark.range(0, 100000, 1, par).select(
        lit(1L).as("src"), pmod(xxhash64(col("id"), lit(4)), lit(n)).as("dst"))
      val edges = rand.unionByName(hub)
      val nodes = spark.range(0, n, 1, par).select(col("id"))
      val t0 = System.nanoTime()
      val ranks = graft.frontier.PageRank.pagerank(nodes, edges, iterations = 5)
      val r = ranks.agg(count(lit(1)), sum(col("rank")), max(col("rank"))).head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PRSCALE edges=$m%,d nodes=${r.getLong(0)}%,d ranksum=${r.getDouble(1)}%.6f " +
        f"max=${r.getDouble(2)}%.6g $secs%6.2f s (${m * 5 / secs / 1e6}%.1f M edge-visits/s)")
      // the hot authority must hold the top rank by a wide margin
      val top = ranks.orderBy(col("rank").desc).limit(1).head()
      println(s"PRSCALE top-node=${top.getLong(0)} (must be 0)")
    }
    spark.stop()
  }
}
