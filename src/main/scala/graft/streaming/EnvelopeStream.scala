package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming restatement of the reference's streaming semantics
  * (SURVEY.md §2.9): micro-batch trigger (the `interval` ticker,
  * /root/reference/crawler/crawler.go:42-51), per-segment progress metrics
  * (the 1000-blocks-or-60s logger flush, /root/reference/crawler/logger.go),
  * and the consumer-side envelope filter
  * (/root/reference/cmd/consumer/consumer.go:21-23, F3).
  *
  * The source is a file-backed envelope stream (the sandbox's Kafka
  * stand-in, see [[graft.queue.FileQueue]]); on a real deployment swap
  * `format("json")` for `format("kafka")` — everything downstream is
  * identical.
  */
object EnvelopeStream {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("url_hash", LongType),
    StructField("url", StringType),
    StructField("host", StringType),
    StructField("seq", LongType),
    StructField("ord", LongType), // per-host commit position (absent → null)
    StructField("round", LongType),
    StructField("version", IntegerType),
    StructField("ts", TimestampType)))

  def readEnvelopes(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(envelopeSchema)
      .option("maxFilesPerTrigger", 4) // batch-bound cap the reference lacks
      .json(dir)

  /** F3: only envelopes whose payload is non-trivial (the consumer filter). */
  def consumerFilter(envelopes: DataFrame): DataFrame =
    envelopes.filter(col("status") === "ACCEPTED" && col("url_hash").isNotNull)

  /** A1 analog: per-(window, host) segment stats with a watermark — the
    * event-time generalization of the reference's processing-time flush.
    */
  def segmentStats(envelopes: DataFrame): DataFrame =
    envelopes
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("host"))
      .agg(count(lit(1)).as("n_envelopes"),
        sum(when(col("status") === "DROPPED", 1L).otherwise(0L)).as("n_dropped"),
        max(col("seq")).as("head_seq"))

  /** Run the stats stream into an in-memory sink until all available input
    * is processed (deterministic micro-batch drain for tests/sandbox).
    */
  def runToMemory(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    val q = segmentStats(consumerFilter(readEnvelopes(spark, dir))
      .unionByName(readEnvelopes(spark, dir).filter(col("status") === "DROPPED")))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q
  }
}
