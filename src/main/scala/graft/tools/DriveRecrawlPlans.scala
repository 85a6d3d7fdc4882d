package graft.tools

import graft.GraftSession
import graft.frontier.{Recrawl, TrapDetect}
import org.apache.spark.sql.functions._

/** Plan evidence for the closing-r5 frontier operators (PLANS.md):
  * - Recrawl.changeRate: the lag window and the aggregate share the url-key
  *   partitioning — expect exactly ONE Exchange in the plan.
  * - TrapDetect census: count-distinct aggregate with map-side partials
  *   (HashAggregate partial_count(distinct ...) below the Exchange).
  */
object DriveRecrawlPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    val fetches = ev.select(col("user_id").as("url_id"),
      col("event_id").as("seq"),
      floor(col("event_id") / ((col("user_id") % 9 + 1) * 50)).as("fp"))
    val rates = Recrawl.changeRate(fetches, "url_id", "seq", "fp")
    val ratesPlan = rates.queryExecution.executedPlan.toString
    val nExchange = "Exchange hashpartitioning".r.findAllIn(ratesPlan).length
    println(s"GRAFT_PLAN recrawl exchanges=$nExchange (want 1)")
    println(rates.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.take(30).mkString("\n"))

    val urls = ev.select(concat(lit("h"), (col("user_id") % 20).cast("string")).as("host"),
      concat(lit("/p/"), col("event_id").cast("string")).as("path"),
      (col("event_id") % 7).cast("string").as("content"))
    val census = TrapDetect.urlTemplates(urls, "host", "path", "content")
    val censusPlan = census.queryExecution.executedPlan.toString
    val hasPartial = censusPlan.contains("partial_")
    println(s"GRAFT_PLAN trap_census map_side_partials=$hasPartial (want true)")

    println(s"GRAFT_ROWS rates=${rates.count()} census=${census.count()}")
    spark.stop()
  }
}
