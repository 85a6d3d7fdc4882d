package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Custom streaming state (flatMapGroupsWithState): the per-host cursor
  * must make the at-least-once producer side effect-idempotent on read.
  */
class HostCursorStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("advance: replays are duplicates, commits monotone, drops counted") {
    val s0 = HostCursorStream.CursorState(0, 0, 0, 0)
    val s1 = HostCursorStream.advance(s0,
      Seq(("ACCEPTED", 1L), ("ACCEPTED", 2L), ("ACCEPTED", 3L)))
    assert(s1 === HostCursorStream.CursorState(3, 3, 0, 0))
    // full replay of the same round (producer crashed between emit and
    // checkpoint): zero new commits
    val s2 = HostCursorStream.advance(s1,
      Seq(("ACCEPTED", 1L), ("ACCEPTED", 2L), ("ACCEPTED", 3L)))
    assert(s2 === HostCursorStream.CursorState(3, 3, 0, 3))
    // revision retraction + new commits, arriving out of order
    val s3 = HostCursorStream.advance(s2,
      Seq(("ACCEPTED", 5L), ("DROPPED", 3L), ("ACCEPTED", 4L)))
    assert(s3 === HostCursorStream.CursorState(5, 5, 1, 3))
  }

  test("streaming end-to-end: per-host state survives micro-batches, replay adds nothing") {
    val dir = Files.createTempDirectory("graft-cursor").toString
    def write(name: String, rows: Seq[(String, String, Long)]): Unit = {
      val p = java.nio.file.Paths.get(dir, name)
      val json = rows.map { case (h, st, o) =>
        s"""{"status":"$st","host":"$h","ord":$o,"url_hash":1,"seq":$o,"round":1,"version":1}"""
      }.mkString("\n")
      Files.writeString(p, json)
    }
    write("seg0.json", Seq(("a", "ACCEPTED", 1L), ("a", "ACCEPTED", 2L),
      ("a", "ACCEPTED", 3L), ("b", "ACCEPTED", 1L)))

    val q = HostCursorStream.hostCursor(
      spark.readStream.schema(EnvelopeStream.envelopeSchema)
        .option("maxFilesPerTrigger", 1).json(dir))
      .writeStream.outputMode("update").format("memory")
      .queryName("cursor_test")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      // at-least-once replay of seg0 plus new work
      write("seg1.json", Seq(("a", "ACCEPTED", 1L), ("a", "ACCEPTED", 2L),
        ("a", "ACCEPTED", 3L), ("a", "ACCEPTED", 4L),
        ("b", "DROPPED", 1L), ("b", "ACCEPTED", 2L), ("b", "ACCEPTED", 3L)))
      q.processAllAvailable()

      val byHost = spark.table("cursor_test")
        .groupBy("host")
        .agg(max("head_ord").as("head"), max("n_committed").as("c"),
          max("n_retracted").as("r"), max("n_duplicates").as("d"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(byHost("a") === ((4L, 4L, 0L, 3L)),
        s"host a cursor wrong: ${byHost("a")}")
      assert(byHost("b") === ((3L, 3L, 1L, 0L)),
        s"host b cursor wrong: ${byHost("b")}")
    } finally q.stop()
  }
}
