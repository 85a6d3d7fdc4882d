package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // minute 100 base: epoch-0 event times sit exactly ON the initial
  // watermark and are discarded as late — a fixture artifact, not a
  // semantics we want to exercise
  private def ts(minute: Int) = new java.sql.Timestamp((100L + minute) * 60000L)

  test("streaming exact dedup: first arrival wins within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.dedupByContent(docs)
      .select("doc_id", "content_hash")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: two distinct contents
      in.addData((1L, ts(0), "alpha beta"), (2L, ts(1), "gamma"))
      q.processAllAvailable()
      // batch 2: an exact dup of doc 1 inside the horizon + fresh content
      in.addData((4L, ts(5), "alpha beta"), (5L, ts(5), "delta"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(got === Set(1L, 2L, 5L), s"got $got")

      // advance event time far past the horizon: the state for "alpha beta"
      // expires, so a NEW arrival of the same content is emitted again —
      // the documented horizon contract (older re-crawls are the persistent
      // seen-set's job, not stream state)
      in.addData((6L, ts(60), "epsilon"))
      q.processAllAvailable()
      in.addData((7L, ts(61), "alpha beta"))
      q.processAllAvailable()
      val after = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(after === Set(1L, 2L, 5L, 6L, 7L), s"got $after")
    } finally q.stop()
  }

  test("stream result over one horizon equals the batch distinct-content view") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 50).map(i => (i.toLong, ts(i % 8), s"text ${i % 17}"))
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = DedupStream.dedupByContent(in.toDF().toDF("doc_id", "ts", "text"))
      .select("content_hash")
      .writeStream.format("memory").queryName("dedup_batch_eq")
      .outputMode("append").start()
    try {
      rows.grouped(13).foreach { g => in.addData(g); q.processAllAvailable() }
      val streamed = spark.table("dedup_batch_eq").as[Long].collect().sorted
      val batch = rows.toDF("doc_id", "ts", "text")
        .select(xxhash64(col("text"))).distinct().as[Long].collect().sorted
      // same distinct-content set, each exactly once
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }
}
