package graft.tools
import graft.frontier.{Scheduler, SeenSet}
import graft.functions.GraftExpressions._
import org.apache.spark.sql.functions._
object DriveFrontier {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(a: Array[String]): Unit = {
    val n = a.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = a.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.get(cores)
    val parts = spark.sparkContext.defaultParallelism
    val hosts = 256
    val frontier = spark.range(0, n, 1, parts)
      .select(concat(lit("HTTP://Host"), pmod(col("id"), lit(hosts)).cast("string"),
        lit(".Example.COM:80/p/./x/../"), col("id").cast("string"), lit("#f")).as("raw_url"))
      .select(canonicalize_url(col("raw_url")).as("url"))
      .select(col("url"), xxhash64(col("url")).as("url_hash"),
        url_host(col("url")).as("host"), url_path(col("url")).as("path"),
        pmod(xxhash64(col("url")), lit(10)).cast("int").as("priority"),
        (xxhash64(col("url")) % 100000).as("seq"))
    val seen = frontier.filter(col("seq") % 3 === 0).select("url_hash")
    time(s"gen+count cores=$cores")(frontier.count())
    val provider = time(s"bloom-build cores=$cores") {
      val blooms = SeenSet.buildBloomsDf(seen,
        math.max(n / SeenSet.DefaultShards, 1024L)).localCheckpoint(true)
      SeenSet.broadcastProvider(spark, blooms)
    }
    val fresh = SeenSet.filterNew(spark, frontier, seen, provider)
    time(s"dedup cores=$cores")(fresh.count())
    val hostState = spark.range(hosts)
      .select(concat(lit("host"), col("id").cast("string"), lit(".example.com")).as("host"),
        array(lit("/private/")).as("robots_disallow"),
        (lit(1L) + col("id") % 5).as("min_delay_ms"),
        (lit(1000) + col("id").cast("int") % 100).as("budget"))
    time(s"schedule cores=$cores")(Scheduler.schedule(fresh, hostState, 10000L).count())
    spark.stop()
  }
}
object DriveFrontier2 {
  def main(a: Array[String]): Unit = {
    val n = a.headOption.map(_.toLong).getOrElse(2000000L)
    a.drop(1).headOption.map(_.split(",").map(_.toInt)).getOrElse(Array(8, 32)).foreach { c =>
      val t = graft.Bench.frontierSecs(c, n)
      println(f"FRONTIER cores=$c n=$n secs=$t%.2f urls_per_sec=${n / t}%.0f")
    }
  }
}
