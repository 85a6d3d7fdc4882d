package graft.tools

import graft.frontier.Scheduler
import org.apache.spark.sql.functions._

/** r6: dump the formatted plan of Scheduler.schedule over a bench-shaped
  * gated input to plans/r06/ — no headline query exercises the scheduler
  * directly, so the plan evidence for the priority-histogram prefilter
  * needs its own artifact. Not part of the driver contract.
  */
object DriveSchedPlan {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("plans/r06/after/scheduler_schedule.txt")
    val spark = graft.GraftSession.get(8)
    val hosts = 256
    val gated = spark.range(0, 2000000L, 1, 8)
      .select(
        concat(lit("host"), pmod(col("id"), lit(hosts)).cast("string"),
          lit(".example.com")).as("host"),
        concat(lit("http://host"), pmod(col("id"), lit(hosts)).cast("string"),
          lit(".example.com/p/"), col("id").cast("string")).as("url"),
        xxhash64(col("id")).as("url_hash"),
        (xxhash64(col("id")) % 100000).as("seq"),
        pmod(xxhash64(col("id")), lit(10)).cast("int").as("priority"))
    val hostState = spark.range(hosts)
      .select(concat(lit("host"), col("id").cast("string"), lit(".example.com")).as("host"),
        (lit(1L) + col("id") % 5).as("min_delay_ms"),
        (lit(800) + col("id").cast("int") % 100).as("budget"))
    val plan = Scheduler.schedule(gated, hostState, 10000L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"PLAN_WRITTEN $out")
    spark.stop()
  }
}
