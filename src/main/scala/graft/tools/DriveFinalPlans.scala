package graft.tools

import org.apache.spark.sql.functions._

/** Plan evidence for the final-r5 operators (PLANS.md "Final-r5 ops"):
  * sitemap extraction must be shuffle-free scan-speed work, TF-IDF's only
  * wide operations must be the two count aggregates + the per-DOC window,
  * the LM scorer must carry |V| in-plan as a broadcast, and one PageRank
  * iteration must shuffle nothing wider than (long, double) rows.
  */
object DriveFinalPlans {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val d = "/root/testdata/sf0.01"

    def planOf(name: String): String = {
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }

    val sm = planOf("q_sitemap")
    println("######## q_sitemap")
    println(sm)
    assert(!sm.contains("Exchange"),
      "sitemap extraction must not shuffle — scan + generate + filter only")
    assert(sm.contains("Generate"), "entry explode must be a stock Generate")
    println("SITEMAP_PLAN_OK no-exchange generate pipeline")

    val tf = planOf("q_tfidf")
    println("######## q_tfidf")
    println(tf)
    assert(tf.contains("Window"), "top-k must be a window rank")
    assert(tf.contains("hashpartitioning(id"),
      "window must partition by DOC id — the finest key, never global")
    assert(tf.contains("BroadcastNestedLoopJoin") || tf.contains("BroadcastExchange"),
      "N must ride in-plan as a broadcast 1-row aggregate")
    println("TFIDF_PLAN_OK per-doc window, broadcast N")

    val lm = planOf("q_lm_quality")
    println("######## q_lm_quality")
    println(lm)
    assert(lm.contains("BroadcastNestedLoopJoin") || lm.contains("BroadcastExchange"),
      "|V| must ride in-plan as a broadcast 1-row aggregate")
    assert(lm.contains("HashAggregate"), "count tables are hash aggregates")
    println("LM_PLAN_OK broadcast |V|, hash-aggregate counts")

    // One PageRank iteration, planned standalone: the iterated shuffles
    // must carry only narrow (long, double) rows — never the edge payload.
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val n = docs.count().toDouble
    val edges = docs.select(col("doc_id").as("src"),
      pmod(xxhash64(col("doc_id")), lit(500L)).as("dst"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesW = edges.join(deg, Seq("src"))
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint(true)
    val ranks = docs.select(col("doc_id").as("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    val step = edgesW.join(ranks, col("src") === col("id"))
      .groupBy(col("dst").as("id")).agg(sum(col("rank") * col("w")).as("c"))
    val pr = step.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println("######## pagerank single iteration")
    println(pr)
    val exchanges = "Exchange".r.findAllIn(pr).length
    println(s"PAGERANK_ITER exchanges=$exchanges (ranks->join, partial-agg->final)")
    assert(pr.contains("HashAggregate"), "contribution sum must partial-aggregate")
    assert(!pr.toLowerCase.contains("cartesian"), "no cartesian anywhere")
    println("PAGERANK_PLAN_OK narrow iterated shuffles")
    spark.stop()
  }
}
