package graft.tools

object DriveSmoke {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(4)
    spark.sparkContext.setLogLevel("WARN")
    val cfg = graft.fixtures.WebConfig(numSeeds = 30, rounds = 3)
    val state = java.nio.file.Files.createTempDirectory("smoke-crawl-state").toString
    val sink = java.nio.file.Files.createTempDirectory("smoke-crawl-sink").toString
    try {
      graft.crawl.CrawlJob.run(spark, cfg, state, sink)
      println("SMOKE_EMITS=" + graft.crawl.CrawlJob.readEmits(spark, sink).count())
    } catch {
      case e: Throwable =>
        println("SMOKE_FAIL=" + e)
        e.printStackTrace()
    }
    spark.stop()
  }
}
