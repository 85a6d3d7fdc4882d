package graft.tools

import graft.fixtures.WebConfig

/** Scale exercise of the FULL crawl loop (not the bench kernel): many hosts,
  * thousands of seeds, growing frontier — reports per-round wall time so a
  * round whose cost grows with history (instead of with the round's delta)
  * shows up immediately.
  */
object DriveCrawlScale {
  def main(a: Array[String]): Unit = {
    val cores = a.headOption.map(_.toInt).getOrElse(8)
    val seeds = a.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val rounds = a.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.get(cores)
    val cfg = WebConfig(numHosts = 128, numSeeds = seeds, rounds = rounds,
      maxOutlinks = 4, windowK = 16)
    val state = java.nio.file.Files.createTempDirectory("crawl-scale-state").toString
    val sink = java.nio.file.Files.createTempDirectory("crawl-scale-sink").toString
    val t00 = System.nanoTime()
    (1 to rounds).foreach { r =>
      val t0 = System.nanoTime()
      graft.crawl.CrawlJob.run(spark, cfg, state, sink, upToRound = Some(r),
        bloomThreshold = 0L)
      println(f"ROUND $r%2d: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val emits = graft.crawl.CrawlJob.readEmits(spark, sink).count()
    val seen = graft.crawl.CrawlJob.readSeen(spark, state).count()
    println(f"TOTAL: ${(System.nanoTime() - t00) / 1e9}%.1f s emits=$emits seen=$seen")
    spark.stop()
  }
}
