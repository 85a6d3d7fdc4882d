package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph PageRank — the crawl-side quality/priority signal a frontier
  * scheduler wants beyond per-host politeness (the reference walks a chain,
  * so its "priority" is trivially sequential; a web frontier is a graph, and
  * rank-ordered scheduling is the standard generalization; see
  * `/root/reference/syncronizer/syncronizer.go:40-74` for the reference's
  * linear walk loop this generalizes).
  *
  * Power iteration with a FIXED iteration count so the result is
  * deterministic and externally replayable (the driver's DuckDB oracle
  * unrolls the same iterations in SQL). Semantics:
  *
  *   rank_0(v)     = 1/N
  *   rank_{t+1}(v) = (1-d)/N + d · ( Σ_{(u,v)∈E} rank_t(u)/deg(u)
  *                                   + danglingMass_t / N )
  *
  * Edges are a MULTISET — parallel edges carry proportional weight, and
  * self-loops are legal (both sides of the oracle treat them identically).
  * Nodes with no out-edges (danglers) redistribute their mass uniformly, so
  * Σ rank = 1 at every step.
  *
  * Shape for 100 TB: per iteration exactly two shuffles of NARROW rows —
  * ranks (long, double) hash to the edge partitioning for the src join, and
  * (dst, contribution) pairs hash for the sum — the edge set itself is
  * weighted once up front and never reshuffled logically (on a real catalog
  * you bucket the edge table by src so the per-iteration src-side exchange
  * disappears entirely; in this repo's plain-parquet layer the planner
  * re-exchanges it, which is the documented Iceberg-seam cost). Lineage is
  * cut per iteration (`localCheckpoint`), the same discipline as
  * [[graft.dedup.Dedup.connectedComponents]], so the plan stays O(1) deep
  * regardless of iteration count. Driver-side work is one node count up
  * front plus, ONLY when danglers exist, a 1-row mass aggregate per
  * iteration (the same bounded-probe budget as the CC convergence check).
  */
object PageRank {

  /** @param nodes single-column DataFrame of long node ids (deduped here)
    * @param edges (src: long, dst: long) multiset; endpoints must be ⊆ nodes
    * @return (id, rank) for every node, Σ rank = 1
    */
  def pagerank(nodes: DataFrame, edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    val ids = nodes.select(col(nodes.columns.head).cast("long").as("id"))
      .distinct().localCheckpoint(true)
    val n = ids.count().toDouble
    require(n > 0, "pagerank over an empty node set")

    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesW = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .join(deg, Seq("src"))
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint(true)

    val danglers = ids.join(
        edgesW.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
      .localCheckpoint(true)
    val hasDanglers = !danglers.isEmpty

    var ranks = ids.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val mass =
        if (hasDanglers)
          danglers.join(ranks, Seq("id"))
            .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
        else 0.0
      val contrib = edgesW.join(ranks, col("src") === col("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") * col("w")).as("c"))
      ranks = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + lit(mass / n))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
