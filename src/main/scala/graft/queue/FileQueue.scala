package graft.queue

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** File-backed queue: the sandbox stand-in for the reference's Kafka sink +
  * manual-commit consumer (SURVEY.md §2.1 S6, §2.2 K1/K6;
  * /root/reference/kafka/writer.go, reader.go).
  *
  * Producer: each `append` writes one immutable segment directory of JSON
  * envelopes per topic (one message per line — the reference's
  * one-JSON-object-per-Kafka-message contract). Fan-out to multiple topics =
  * one append per sink config, exactly like the reference's per-topic write
  * loop (/root/reference/crawler/blocks.go:230-250).
  *
  * Consumer: reads segments beyond the committed offset; `commit` persists
  * the new offset ATOMICALLY only after the caller processed the batch —
  * manual offset commit semantics
  * (/root/reference/cmd/consumer/consumer.go:24-28): crash before commit ⇒
  * the segment is re-read (at-least-once).
  */
final class FileQueue(val dir: String) {
  private val root = Paths.get(dir)
  Files.createDirectories(root)

  private def topicDir(topic: String) = root.resolve(topic)

  private def segments(topic: String): Seq[Long] = {
    val td = topicDir(topic)
    if (!Files.exists(td)) Seq.empty
    else {
      val s = Files.list(td)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("seg-"))
        .map(_.stripPrefix("seg-").toLong)
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Producer: append a DataFrame of envelopes as the next segment. */
  def append(topic: String, envelopes: DataFrame): Long = {
    val segId = segments(topic).lastOption.map(_ + 1).getOrElse(0L)
    val tmp = topicDir(topic).resolve(f".seg-tmp-$segId%06d")
    envelopes.write.mode(SaveMode.Overwrite).json(tmp.toString)
    Files.move(tmp, topicDir(topic).resolve(f"seg-$segId%06d"),
      StandardCopyOption.ATOMIC_MOVE)
    segId
  }

  private def offsetFile(topic: String, group: String) =
    topicDir(topic).resolve(s"offset-$group")

  def committedOffset(topic: String, group: String): Long = {
    val f = offsetFile(topic, group)
    if (Files.exists(f)) Files.readString(f).trim.toLong else -1L
  }

  /** Consumer: all segments after the group's committed offset (empty
    * DataFrame with the given schema if none).
    */
  def poll(spark: SparkSession, topic: String, group: String,
      schema: org.apache.spark.sql.types.StructType): (DataFrame, Long) = {
    val from = committedOffset(topic, group)
    val segs = segments(topic).filter(_ > from)
    if (segs.isEmpty)
      (spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), from)
    else {
      val paths = segs.map(s => topicDir(topic).resolve(f"seg-$s%06d").toString)
      (spark.read.schema(schema).json(paths: _*), segs.max)
    }
  }

  /** Manual commit AFTER downstream handling (at-least-once contract). */
  def commit(topic: String, group: String, offset: Long): Unit = {
    val tmp = topicDir(topic).resolve(s".offset-tmp-$group")
    Files.writeString(tmp, offset.toString)
    Files.move(tmp, offsetFile(topic, group),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
