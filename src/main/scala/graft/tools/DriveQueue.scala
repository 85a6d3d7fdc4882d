package graft.tools
import graft.queue.FileQueue
import graft.streaming.EnvelopeStream
import graft.ingest.BlockIngest
import org.apache.spark.sql.functions._
object DriveQueue {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    import spark.implicits._
    // drive: crawl emits -> file queue -> consumer poll/commit -> streaming stats
    val cfg = graft.fixtures.WebConfig(numSeeds = 20, rounds = 2)
    val st = java.nio.file.Files.createTempDirectory("dq-state").toString
    val sk = java.nio.file.Files.createTempDirectory("dq-sink").toString
    graft.crawl.CrawlJob.run(spark, cfg, st, sk)
    val emits = graft.crawl.CrawlJob.readEmits(spark, sk)
      .withColumn("version", lit(1)).withColumn("ts", current_timestamp())
      .select("status","url_hash","url","host","seq","round","version","ts")
    val q = new FileQueue(java.nio.file.Files.createTempDirectory("dq-q").toString)
    q.append("hooks", emits)
    val (polled, off) = q.poll(spark, "hooks", "judge", EnvelopeStream.envelopeSchema)
    println(s"QUEUE polled=${polled.count()} offset=$off committed_before=${q.committedOffset("hooks","judge")}")
    q.commit("hooks", "judge", off)
    println(s"QUEUE after_commit=${q.poll(spark, "hooks", "judge", EnvelopeStream.envelopeSchema)._1.count()} committed=${q.committedOffset("hooks","judge")}")
    // probe: poll a topic that doesn't exist
    val (empty, eoff) = q.poll(spark, "nope", "judge", EnvelopeStream.envelopeSchema)
    println(s"QUEUE empty_topic=${empty.count()} off=$eoff")
    // golden ingest through public API + envelope + json round-trip
    val blocks = BlockIngest.convert(
      BlockIngest.readRawBlocks(spark, "/root/reference/testdata/eth-block-18721004.json"),
      BlockIngest.readRawReceipts(spark, "/root/reference/testdata/eth-txn-receipts-18721004.json"))
    val env = BlockIngest.envelope(blocks, "ACCEPTED",
      addresses = Seq.empty, topics = Seq(Seq.empty))
    val s = env.as[String].head()
    println("INGEST envelope_len=" + s.length + " has_block=" + s.contains("\"number\":18721004"))
    spark.stop()
  }
}
