package graft.tools

import org.apache.spark.sql.functions._

/** Plan evidence for the late-r5 operators: the stratified sample must be a
  * pure filter with [[graft.functions.GraftExpressions.Mix64Salted]] inside
  * a WholeStageCodegen span (no Exchange anywhere — at 100 TB this is a
  * scan that emits only the sample), the PII scrub must be a single
  * codegen'd projection, and the fingerprint-dup join must show the
  * bucket-cap semi-join pruning candidates before the pair self-join.
  */
object DriveSamplePlans {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val d = "/root/testdata/sf0.01"

    def planOf(name: String): String = {
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }

    val sample = planOf("q_sample_stratified")
    println("######## q_sample_stratified")
    println(sample)
    assert(!sample.contains("Exchange"),
      "stratified sample must not shuffle — it is a pure filter")
    assert(sample.contains("mix64_salted"), "hash must be the codegen expr")
    // formatted mode marks whole-stage-codegen operators with a `*` prefix
    // and a [codegen id : n] detail line rather than a WholeStageCodegen node
    assert(sample.contains("* Filter"), "filter must be codegen'd")
    println("SAMPLE_PLAN_OK no-exchange, codegen mix64 filter")

    val pii = planOf("q_pii_scrub")
    println("######## q_pii_scrub")
    println(pii)
    assert(!pii.contains("Exchange"), "PII scrub is scan+project only")
    assert(pii.contains("* Project"), "projection must be codegen'd")
    println("PII_PLAN_OK no-exchange, codegen projection")

    val fpd = planOf("q_fingerprint_dups")
    println("######## q_fingerprint_dups")
    println(fpd)
    assert(fpd.contains("LeftSemi"),
      "bucket-cap semi-join must prune candidates before the pair join")
    println("FPD_PLAN_OK cap semi-join present")

    val rep = planOf("q_repetition")
    println("######## q_repetition")
    println(rep)
    assert(!rep.contains("Exchange"),
      "repetition metrics are per-row expressions — no shuffle")
    println("REP_PLAN_OK no-exchange per-row metrics")

    val dec = planOf("q_decontaminate")
    println("######## q_decontaminate")
    println(dec)
    assert(dec.contains("BroadcastHashJoin") && dec.contains("LeftSemi"),
      "eval grams must broadcast onto the corpus side (semi-join)")
    assert(dec.contains("partial_count"),
      "per-doc hit count must partial-aggregate map-side")
    println("DEC_PLAN_OK broadcast semi-join + partial agg")

    spark.stop()
  }
}
