package graft.tools

import graft.frontier.Scheduler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r6 measurement (guide §1): sub-step timing of Scheduler.schedule on the
  * bench-shaped gated input, at a chosen core count — quantifies the
  * prefilter's effect and the residual fixed cost per variant. Pure
  * diagnostic; not part of the driver contract.
  *
  * Usage: runMain graft.tools.DriveSchedPerf [cores] [nRows]
  */
object DriveSchedPerf {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val spark = graft.GraftSession.builder(cores)
      .appName(s"sched-perf-$cores").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hosts = 256
    val gated = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .select(
        concat(lit("host"), pmod(col("id"), lit(hosts)).cast("string"),
          lit(".example.com")).as("host"),
        concat(lit("http://host"), pmod(col("id"), lit(hosts)).cast("string"),
          lit(".example.com/p/"), col("id").cast("string")).as("url"),
        xxhash64(col("id")).as("url_hash"),
        (xxhash64(col("id")) % 100000).as("seq"),
        pmod(xxhash64(col("id")), lit(10)).cast("int").as("priority"))
      .localCheckpoint(true)
    val hostState = spark.range(hosts)
      .select(concat(lit("host"), col("id").cast("string"), lit(".example.com")).as("host"),
        (lit(1L) + col("id") % 5).as("min_delay_ms"),
        (lit(800) + col("id").cast("int") % 100).as("budget"))

    def timeIt(label: String, df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SPERF cores=$cores $label%-24s ${ts.min}%.3f s")
    }

    // current production path
    timeIt("schedule_current", Scheduler.schedule(gated, hostState, 10000L))

    // the pre-r6 shape (no histogram prefilter), inlined
    timeIt("schedule_noprefilter", {
      val hs = hostState.select(col("host"), col("min_delay_ms"), col("budget"))
      val g = gated.join(broadcast(hs), Seq("host"), "inner")
        .withColumn("cap", Scheduler.capacity(col("budget"), col("min_delay_ms"), 10000L))
        .drop("min_delay_ms", "budget")
      val narrow = g.select(col("host"), col("url_hash"), col("priority"), col("seq"), col("cap"))
      val salted = narrow.withColumn("salt", pmod(xxhash64(col("url_hash")), lit(Scheduler.Salts)))
      val w1 = Window.partitionBy(col("host"), col("salt"))
        .orderBy(col("priority").desc, col("seq").asc)
      val local = salted.withColumn("r1", row_number().over(w1))
        .filter(col("r1") <= col("cap")).drop("r1", "salt")
      val w2 = Window.partitionBy(col("host")).orderBy(col("priority").desc, col("seq").asc)
      val winners = local.withColumn("host_rank", row_number().over(w2))
        .filter(col("host_rank") <= col("cap"))
        .select(col("host").as("w_host"), col("url_hash"), col("host_rank"))
      g.drop("cap").join(winners, Seq("url_hash"))
        .filter(col("host") === col("w_host")).drop("w_host")
    })

    // prefilter cost alone: histogram + cutoff + the filter pass
    timeIt("prefilter_pass_only", {
      val hs = hostState.select(col("host"), col("min_delay_ms"), col("budget"))
      val g = gated.join(broadcast(hs), Seq("host"), "inner")
        .withColumn("cap", Scheduler.capacity(col("budget"), col("min_delay_ms"), 10000L))
        .drop("min_delay_ms", "budget")
      val narrow = g.select(col("host"), col("url_hash"), col("priority"), col("seq"), col("cap"))
      val hist = narrow.groupBy(col("host"), col("priority"))
        .agg(count(lit(1)).as("pn"), max(col("cap")).as("pcap"))
      val wAbove = Window.partitionBy(col("host")).orderBy(col("priority").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cutoff = hist
        .withColumn("above", coalesce(sum(col("pn")).over(wAbove), lit(0L)))
        .groupBy(col("host"))
        .agg(min(when(col("above") < col("pcap"), col("priority"))).as("pmin"))
      narrow.join(cutoff, Seq("host"))
        .filter(coalesce(col("priority") >= col("pmin"), lit(true)))
        .drop("pmin")
    })

    spark.stop()
  }
}
