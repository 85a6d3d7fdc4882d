package graft.tools
import graft.crawl.CrawlJob
import graft.fixtures.WebConfig
import org.apache.spark.sql.functions._
object DriveCrawl {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val cfg = WebConfig()
    val state = java.nio.file.Files.createTempDirectory("dc-state").toString
    val sink = java.nio.file.Files.createTempDirectory("dc-sink").toString
    println("== run rounds 1-2, crash, resume to 6")
    CrawlJob.run(spark, cfg, state, sink, upToRound = Some(2))
    println("state snapshots after r2: " + new java.io.File(state).list().toSeq.sorted.mkString(","))
    CrawlJob.run(spark, cfg, state, sink)
    val emits = CrawlJob.readEmits(spark, sink)
    emits.groupBy("round", "status").count().orderBy("round", "status").show(30)
    println("== sample emits round 2 (revision round), host-ord sorted")
    emits.filter(col("round") === 2 && col("status") === "DROPPED").orderBy("host", "ord").show(5, false)
    println("== pages sample + metrics")
    CrawlJob.readPages(spark, sink).show(3, false)
    spark.read.parquet(s"$sink/metrics-0003").show(20)
    println("== probe: re-run after completion (should be a no-op, no duplicate emits)")
    val before = emits.count()
    CrawlJob.run(spark, cfg, state, sink)
    val after = CrawlJob.readEmits(spark, sink).count()
    println(s"emit rows before=$before after=$after")
    println("== probe: state tables at LATEST")
    val st = new graft.tables.SnapshotTable(state)
    println("tables: " + st.tableNames().mkString(","))
    CrawlJob.readWindow(spark, st).groupBy("host").count().orderBy(desc("count")).show(5)
    spark.stop()
  }
}
