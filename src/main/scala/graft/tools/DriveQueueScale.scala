package graft.tools

import graft.fixtures.WebConfig
import graft.tables.SnapshotTable
import org.apache.spark.sql.functions._

/** Evidence for the O(delta + scheduled)/round queue contract: run the SAME
  * crawl round against pre-seeded frontiers of different sizes (same hosts,
  * same politeness caps → identical scheduled count per round) and report
  * per-round wall time. A round whose cost grows with TOTAL queued rows —
  * the round-2 design rewrote the full queue as parquet and anti-joined it
  * three times per round; the round-3 design still ranked every alive row in
  * the scheduler — shows a ~Q× slope here. With the head-cache scheduler
  * (r4), a steady-state round touches only the per-host heads and the
  * round's deltas: per-round time should be FLAT from 1M to 10M queued rows
  * (the backing log is read only at seed/compaction).
  *
  *   sbt -batch 'runMain graft.tools.DriveQueueScale 8 1000000,10000000 3'
  */
object DriveQueueScale {
  def main(a: Array[String]): Unit = {
    val cores = a.headOption.map(_.toInt).getOrElse(8)
    val sizes = a.drop(1).headOption.map(_.split(",").map(_.toLong))
      .getOrElse(Array(1000000L, 10000000L))
    val rounds = a.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.get(cores)
    import spark.implicits._
    val cfg = WebConfig(numHosts = 64, rounds = rounds)

    sizes.foreach { q =>
      val stateDir = java.nio.file.Files.createTempDirectory(s"qscale-$q-state").toString
      val sinkDir = java.nio.file.Files.createTempDirectory(s"qscale-$q-sink").toString
      val state = new SnapshotTable(stateDir)
      val parts = spark.sparkContext.defaultParallelism

      // pre-seeded snapshot: Q alive queue rows spread over the config's
      // hosts, allowed paths, seq unique per host — the state a long crawl
      // would have accumulated, without crawling to it
      val queueAdd = spark.range(0, q, 1, parts)
        .select(
          format_string("host%02d.test", (col("id") % cfg.numHosts).cast("int")).as("host"),
          concat(lit("http://host"),
            format_string("%02d", (col("id") % cfg.numHosts).cast("int")),
            lit(".test/p/q"), col("id").cast("string")).as("url"),
          (floor(col("id") / cfg.numHosts) + 1).cast("long").as("seq"))
        .select(col("host"), col("url"), xxhash64(col("url")).as("url_hash"),
          col("seq"), pmod(xxhash64(col("url")), lit(10)).cast("int").as("priority"),
          lit(0L).as("qr"))
      // seed through the same path a real crawl uses: counters, membership,
      // blooms, and the provisioned per-host head cache all derive from the
      // pre-accumulated queue
      graft.crawl.CrawlJob.seedSnapshot(spark, state, queueAdd,
        spark.createDataset(graft.fixtures.SyntheticWeb.hostStates(cfg)).toDF(),
        cfg.roundMillis)

      (1 to rounds).foreach { r =>
        val t0 = System.nanoTime()
        graft.crawl.CrawlJob.run(spark, cfg, stateDir, sinkDir, upToRound = Some(r))
        val secs = (System.nanoTime() - t0) / 1e9
        val scheduled = spark.read.parquet(f"$sinkDir/pages-$r%04d").count()
        println(f"QSCALE queued=$q%,d round=$r: $secs%6.2f s (committed=$scheduled)")
      }
      val alive = graft.crawl.CrawlJob.readQueue(spark, stateDir).count()
      println(f"QSCALE queued=$q%,d final alive=$alive%,d")
    }
    spark.stop()
  }
}
