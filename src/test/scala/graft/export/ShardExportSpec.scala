package graft.export

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two-phase distributed shard assignment against the one-window
  * closed form, the shard-size packing bounds, determinism across runs, and
  * the plan shape (range partition present; no full-data single-partition
  * sort — the only SinglePartition exchange allowed is the P-row offsets
  * aggregate).
  */
class ShardExportSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 2000 rows, adversarial sizes: mostly small, a few giants that overshoot
  // several shard targets in one row (shard-id gaps must still be correct).
  private lazy val rows = spark.range(0, 2000, 1, 8)
    .select(col("id"),
      (pmod(xxhash64(col("id")), lit(97L)) + 1L +
        when(pmod(col("id"), lit(211L)) === 0L, lit(5000L)).otherwise(lit(0L)))
        .as("sz"))

  private val target = 1000L

  private def groundTruth = {
    // the naive single-partition window: fine at 2000 rows, the thing the
    // operator exists to avoid at scale
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.withColumn("shard_id",
      floor((sum(col("sz")).over(w) - col("sz")) / lit(target.toDouble)))
      .select("id", "sz", "shard_id")
  }

  test("two-phase assignment equals the single-window closed form") {
    val got = ShardExport.assignShards(rows, "id", "sz", target, partitions = 8)
      .select("id", "sz", "shard_id")
    assert(got.except(groundTruth).isEmpty && groundTruth.except(got).isEmpty)
  }

  test("packing bounds: every shard overshoots target by less than one row") {
    val assigned = ShardExport.assignShards(rows, "id", "sz", target, partitions = 8)
    val maxSz = rows.agg(max("sz")).as[Long].head()
    val man = ShardExport.manifest(assigned, "sz")
      .orderBy("shard_id").as[(Long, Long, Long)].collect()
    val lastShard = man.map(_._1).max
    man.foreach { case (sid, n, bytes) =>
      assert(n > 0)
      assert(bytes < target + maxSz, s"shard $sid holds $bytes")
      // every non-terminal shard is filled to ≥ target unless a giant row in
      // an earlier shard swallowed its whole offset range (the gap case)
      if (sid != lastShard) assert(bytes + maxSz > target, s"shard $sid underfull: $bytes")
    }
    assert(man.map(_._3).sum === rows.agg(sum("sz")).as[Long].head())
    assert(man.map(_._2).sum === 2000L)
  }

  test("giant rows create shard-id gaps, never misassignment") {
    val giants = Seq((1L, 10L), (2L, 5000L), (3L, 10L), (4L, 10L)).toDF("id", "sz")
    val got = ShardExport.assignShards(giants, "id", "sz", 100L, partitions = 2)
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
    // starts: 0, 10, 5010, 5020 → shards 0, 0, 50, 50
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 50L, 4L -> 50L))
  }

  test("deterministic across independent runs") {
    val a = ShardExport.assignShards(rows, "id", "sz", target, partitions = 8)
      .select("id", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = ShardExport.assignShards(rows, "id", "sz", target, partitions = 8)
      .select("id", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("plan: range-partitioned scan, no full-data single-partition sort") {
    val plan = ShardExport.assignShards(rows, "id", "sz", target, partitions = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(2000))
    // the only SinglePartition exchange is the P-row offsets window
    val single = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(single <= 1, s"unexpected single-partition exchanges: $single\n" + plan.take(4000))
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "offsets should broadcast-join back")
  }
}
