package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CuckooFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def mixKeys(n: Int, salt: Long): Seq[Long] =
    (0 until n).map(i => graft.functions.GraftHash.mix64(i.toLong, salt))

  test("no false negatives at true 0.9 load; fpp near the 16-bit-fingerprint bound") {
    val sk = CuckooSketch.create(10000)
    val slots = 4 << sk.bucketsLog2
    val n = (slots * 0.9).toInt // fill to 0.9 of the REAL table, past pow2 slack
    val keys = mixKeys(n, 1L)
    keys.foreach(k => assert(sk.insert(k), s"insert failed at load ${sk.occupied}/$slots"))
    keys.foreach(k => assert(sk.mightContain(k), s"false negative on $k"))
    val probes = mixKeys(200000, 2L)
    val fp = probes.count(sk.mightContain)
    // bound ≈ 8·load/2^16 ≈ 1.1e-4 → expect ~22 of 200k; assert an order above
    assert(fp < 200, s"cuckoo fpp too high: $fp/200000")
  }

  test("delete removes inserted keys and restores negatives; survivors stay positive") {
    val keys = mixKeys(5000, 3L)
    val sk = CuckooSketch.create(5000)
    keys.foreach(k => assert(sk.insert(k)))
    val (dropped, kept) = keys.partition(k => k % 2 == 0)
    dropped.foreach(k => assert(sk.delete(k), s"delete missed $k"))
    kept.foreach(k => assert(sk.mightContain(k), s"false negative after deletes on $k"))
    // deleted keys should read negative again except for fp collisions
    val stillPositive = dropped.count(sk.mightContain)
    assert(stillPositive < 20, s"deletes did not take: $stillPositive/${dropped.size}")
  }

  test("merge re-inserts by bucket index: union answers preserved") {
    val a = mixKeys(2000, 4L)
    val b = mixKeys(2000, 5L)
    val sa = CuckooSketch.create(5000)
    val sb = CuckooSketch.create(5000)
    a.foreach(k => assert(sa.insert(k)))
    b.foreach(k => assert(sb.insert(k)))
    sa.mergeInPlace(sb)
    (a ++ b).foreach(k => assert(sa.mightContain(k), s"lost $k in merge"))
  }

  test("serialize round-trip preserves answers") {
    val keys = mixKeys(1000, 6L)
    val sk = CuckooSketch.create(1000)
    keys.foreach(sk.insert)
    val back = CuckooSketch.deserialize(CuckooSketch.serialize(sk))
    keys.foreach(k => assert(back.mightContain(k)))
    assert(back.occupied === sk.occupied)
  }

  test("sharded table is dense; filterNew ≡ exact anti-join (A/B)") {
    val seenKeys = mixKeys(4000, 7L)
    val newKeys = mixKeys(4000, 8L).filterNot(seenKeys.toSet)
    val seen = seenKeys.toDF("url_hash")
    val table = CuckooSet.buildCuckooDf(seen, 1024)
    assert(table.count() === CuckooSet.DefaultShards)
    val prov = CuckooSet.broadcastProvider(spark, table)
    val out = CuckooSet.filterNew(spark, (seenKeys ++ newKeys).toDF("url_hash"),
      seen, prov).as[Long].collect().toSet
    assert(out === newKeys.toSet)
  }

  test("applyDeletes shrinks the maybe-seen fraction where the bloom cannot") {
    // crawl-with-revisions shape: half the members get retracted. The bloom
    // keeps every tombstone as a permanent positive; the cuckoo forgets it.
    val members = mixKeys(6000, 9L)
    val (retracted, live) = members.partition(k => k % 2 == 0)
    val table = CuckooSet.buildCuckooDf(members.toDF("url_hash"), 1024)
    val after = CuckooSet.applyDeletes(table, retracted.toDF("url_hash"))
    val prov = CuckooSet.broadcastProvider(spark, after)
    live.foreach(k => assert(prov.mightContain(k), s"live member lost: $k"))
    val stale = retracted.count(prov.mightContain)
    assert(stale < 20, s"retracted keys still positive: $stale/${retracted.size}")
    // and dedup against the LIVE set stays exact through the deleted filter
    val cands = (members ++ mixKeys(2000, 10L)).distinct
    val out = CuckooSet.filterNew(spark, cands.toDF("url_hash"),
      live.toDF("url_hash"), prov).as[Long].collect().toSet
    assert(out === cands.filterNot(live.toSet).toSet)
  }

  test("probe stays inside WholeStageCodegen") {
    val table = CuckooSet.buildCuckooDf(mixKeys(100, 11L).toDF("url_hash"), 256)
    val prov = CuckooSet.broadcastProvider(spark, table)
    val plan = spark.range(100).select(col("id").as("url_hash"))
      .filter(CuckooSet.cuckoo_might_contain(col("url_hash"), prov))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the tree string —
    // the probe-bearing Filter must carry one
    assert(plan.contains("*(1) Filter cuckoo_might_contain"), plan)
  }
}
