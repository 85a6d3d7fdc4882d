package graft.tools

/** Plan evidence for the final-session-r5 operators (PLANS.md
  * "Final-session-r5 ops"): SemDeDup's candidate stage must never plan a
  * cartesian product, and the sketch-gated quantiles must compute both the
  * exact and approx percentiles in ONE lang-keyed aggregation (a second
  * Exchange would mean the sketch ran as a separate job over the table).
  */
object DriveLastPlans {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val d = "/root/testdata/sf0.01"

    def planOf(name: String): String =
      graft.SparkEntry.queries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

    val sd = planOf("q_semdedup")
    println("######## q_semdedup")
    println(sd)
    assert(!sd.contains("CartesianProduct"),
      "SemDeDup candidates must be a cell-keyed equi-join, never cartesian")
    println("SEMDEDUP_PLAN_OK no-cartesian")

    val lq = planOf("q_len_quantiles")
    println("######## q_len_quantiles")
    println(lq)
    val exchanges = lq.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, // partial->final agg = 1 shuffle; formatted mode
      // lists the node once per occurrence — anything beyond the single
      // hashpartitioning(lang) exchange means a second pass over the table
      s"expected one lang-keyed Exchange, saw $exchanges")
    assert(lq.contains("ObjectHashAggregate") || lq.contains("SortAggregate"),
      "percentile buffers should plan as ObjectHashAggregate/SortAggregate")
    println(s"QUANTILES_PLAN_OK exchanges=$exchanges")

    spark.stop()
  }
}
