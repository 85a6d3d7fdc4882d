package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for a continuous document-ingest pipeline — the
  * at-ingest counterpart of [[graft.dedup.Dedup.exactDupGroups]] (which is
  * one hash-aggregate over a corpus at rest).
  *
  * `dropDuplicatesWithinWatermark` keys state by content hash and expires
  * it at the event-time watermark horizon, so streaming-state size is
  * bounded by the duplicate-arrival window (duplicates in a crawl cluster
  * tightly in time: mirror fan-out, re-posts, retry storms), NOT by corpus
  * size. Duplicates separated by more than the horizon are deliberately
  * out of scope here — catching a re-crawl of last month's page is the
  * persistent seen-set's job ([[graft.frontier.SeenSet]], O(delta)
  * maintenance), not unbounded stream state. The two layers compose:
  * stream dedup bounds what reaches the sink per window; the seen set
  * bounds what re-enters the frontier at all.
  *
  * State shape at scale: one (hash → timestamp) entry per distinct
  * content in the horizon, partitioned by hash across executors by the
  * streaming aggregation exchange — no skew (hashes are uniform), no
  * driver-side anything.
  */
object DedupStream {

  /** Distinct-content view of a streaming document batch: first arrival
    * wins, duplicates within the watermark horizon are dropped. `docs`
    * must carry an event-time column `ts` and the text column.
    */
  def dedupByContent(docs: DataFrame, textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", xxhash64(col(textCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
