package graft.tools

import org.apache.spark.sql.functions._

/** Scale evidence for `Dedup.connectedComponents`: the same graph shape at
  * two edge counts, timing the full large-star/small-star run. The graph
  * mixes the two hard regimes — a sea of small random components (the
  * realistic near-dup shape) and one long chain (the diameter case that
  * breaks min-label propagation). Usage:
  *   GRAFT_TIMING=1 sbt 'runMain graft.tools.DriveCcScale 8 1000000,10000000'
  */
object DriveCcScale {
  def main(a: Array[String]): Unit = {
    val cores = a.headOption.map(_.toInt).getOrElse(8)
    val sizes = a.drop(1).headOption.map(_.split(",").map(_.toLong))
      .getOrElse(Array(1000000L, 10000000L))
    val spark = graft.GraftSession.get(cores)

    sizes.foreach { m =>
      // ~m random edges over 0.8m nodes (component sizes geometric-ish),
      // plus a 10k-node chain: depth >> alternation budget
      val n = (m * 4) / 5
      val rand = spark.range(0, m, 1, spark.sparkContext.defaultParallelism)
        .select(
          pmod(xxhash64(col("id"), lit(1)), lit(n)).as("id1"),
          pmod(xxhash64(col("id"), lit(2)), lit(n)).as("id2"))
      val chain = spark.range(0, 10000)
        .select((col("id") + n).as("id1"), (col("id") + n + 1).as("id2"))
      val edges = rand.unionByName(chain)
      val t0 = System.nanoTime()
      val comp = graft.dedup.Dedup.connectedComponents(edges)
      val (nodes, comps) = {
        val r = comp.agg(count(lit(1)), countDistinct(col("component"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"CCSCALE edges=$m%,d nodes=$nodes%,d components=$comps%,d $secs%6.2f s")
      // chain sanity: all 10001 chain nodes must share one component
      val chainComps = comp.filter(col("id") >= n)
        .agg(countDistinct(col("component"))).head().getLong(0)
      println(s"CCSCALE chain-components=$chainComps (must be 1)")
    }
    spark.stop()
  }
}
