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

  test("integration: the engine's own emits drive the cursor; replaying a round commits nothing") {
    val cfg = graft.fixtures.WebConfig(numSeeds = 30, rounds = 3)
    val state = Files.createTempDirectory("cursor-crawl-state").toString
    val sink = Files.createTempDirectory("cursor-crawl-sink").toString
    graft.crawl.CrawlJob.run(spark, cfg, state, sink)
    val emits = graft.crawl.CrawlJob.readEmits(spark, sink)

    // batch-mode flatMapGroupsWithState: one pass over all emits
    val clean = HostCursorStream.hostCursor(emits)
      .collect().map(u => u.host -> u).toMap
    val accepted = emits.filter(col("status") === "ACCEPTED")
      .groupBy("host").agg(count(lit(1)).as("n"), max("ord").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    accepted.foreach { case (host, (n, maxOrd)) =>
      val u = clean(host)
      // every ACCEPTED ord is unique per host → all commit, none duplicate
      assert(u.n_committed === n, s"$host committed")
      assert(u.head_ord === maxOrd, s"$host head")
      assert(u.n_duplicates === 0L, s"$host dups on clean run")
    }

    // at-least-once: replay round 3's emits on top (producer crashed between
    // emit and checkpoint) — commits unchanged, replays counted
    val lastRound = emits.filter(col("round") === 3)
    val replayed = HostCursorStream.hostCursor(emits.unionByName(lastRound))
      .collect().map(u => u.host -> u).toMap
    accepted.foreach { case (host, (n, maxOrd)) =>
      val u = replayed(host)
      assert(u.n_committed === n, s"$host committed after replay")
      assert(u.head_ord === maxOrd, s"$host head after replay")
    }
    val replayAccepted = lastRound.filter(col("status") === "ACCEPTED").count()
    assert(replayed.values.map(_.n_duplicates).sum === replayAccepted,
      "every replayed ACCEPTED envelope must count as a duplicate")
  }
}
