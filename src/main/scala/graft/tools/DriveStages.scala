package graft.tools

import graft.frontier.{Scheduler, SeenSet}
import graft.functions.GraftExpressions._
import org.apache.spark.sql.functions._

/** Stage-level timing of one frontier round (the Bench timed region split
  * into its components) — scaling diagnosis. Run pinned:
  *   taskset -c 0-1 java ... graft.tools.DriveStages 2 3000000
  */
object DriveStages {
  def main(a: Array[String]): Unit = {
    val cores = a.headOption.map(_.toInt).getOrElse(8)
    val n = a.drop(1).headOption.map(_.toLong).getOrElse(3000000L)
    val budget = a.drop(2).headOption.map(_.toInt).getOrElse(800)
    val spark = graft.GraftSession.builder(cores)
      .appName(s"graft-stages-$cores").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE cores=$cores $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def gen(m: Long) = {
      val parts = spark.sparkContext.defaultParallelism
      spark.range(0, m, 1, parts)
        .select(concat(lit("HTTP://Host"), pmod(col("id"), lit(256)).cast("string"),
          lit(".Example.COM:80/p/./x/../"), col("id").cast("string"),
          lit("#f")).as("raw_url"))
        .select(canonicalize_url(col("raw_url")).as("url"))
        .select(col("url"), xxhash64(col("url")).as("url_hash"),
          url_host(col("url")).as("host"), url_path(col("url")).as("path"),
          pmod(xxhash64(col("url")), lit(10)).cast("int").as("priority"),
          (xxhash64(col("url")) % 100000).as("seq"))
    }

    // setup (untimed in Bench)
    val seen = gen(n).filter(col("seq") % 3 === 0).select("url_hash").localCheckpoint(true)
    val cap = math.max(n / SeenSet.DefaultShards, 1024L)
    val blooms = SeenSet.buildBloomsDf(seen, cap).localCheckpoint(true)
    val provider = SeenSet.broadcastProvider(spark, blooms)

    // warm-up
    gen(n / 10).count()

    time("gen+count")(gen(n).count())
    val fresh = SeenSet.filterNew(spark, gen(n), seen, provider)
    time("gen+dedup")(fresh.count())

    val hostState = spark.range(256)
      .select(concat(lit("host"), col("id").cast("string"), lit(".example.com")).as("host"),
        array(lit("/private/")).as("robots_disallow"),
        (lit(1L) + col("id") % 5).as("min_delay_ms"),
        (lit(budget) + col("id").cast("int") % 100).as("budget"))
    val scheduled = Scheduler.schedule(fresh, hostState, 10000L)
    time("gen+dedup+schedule")(scheduled.count())

    val sched2 = scheduled.persist()
    sched2.count()
    time("fetch+psnr (on persisted sched)") {
      val validated = sched2.select(pmod(col("url_hash"), lit(4096)).as("img"))
        .as[Long].mapPartitions(_.map { i =>
          val img = graft.fixtures.ImageGen.raster(i)
          val fmt = graft.fixtures.ImageGen.fmtOf(i)
          val bytes = graft.fixtures.ImageGen.encode(img, fmt)
          val decoded = graft.validate.ImageValidate.decode(bytes)
          val p = graft.validate.ImageValidate.psnr(img, decoded)
          if (fmt == "png") (if (p.isPosInfinity) 1L else 0L)
          else (if (p >= graft.validate.ImageValidate.PsnrGateDb) 1L else 0L)
        })
      require(validated.reduce(_ + _) > 0)
    }
    println(s"SCHEDULED_COUNT=${sched2.count()}")
    time("bloom delta+merge") {
      SeenSet.mergeBlooms(blooms,
        SeenSet.bloomDelta(sched2.select("url_hash"), cap)).count()
    }
    spark.stop()
  }
}
