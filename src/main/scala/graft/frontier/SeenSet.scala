package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The URL-seen set: the scale replacement for the reference's 128-deep
  * exact hash window (/root/reference/cache/stack.go). Two layers:
  *
  *  1. an exact, hash-partitioned parquet table of `url_hash` (ground truth,
  *     10^10 rows ≈ 80 GB raw — fine as a bucketed table on a cluster), and
  *  2. sharded [[BloomSketch]]s built from it (shard = pmod(url_hash, S)),
  *     broadcast to executors as a cheap pre-filter.
  *
  * Dedup of a candidate batch (`left-anti` vs 10^10 rows) would shuffle the
  * whole candidate set every round; the bloom probe answers "definitely new"
  * for the overwhelming majority of candidates map-side, so only the
  * ~fpp·|batch| maybe-seen remainder rides the sort-merge anti-join. Both
  * paths are exact in combination: bloom has no false negatives, and false
  * positives are re-checked by the join.
  */
object SeenSet {

  val DefaultShards = 64

  /** Build per-shard bloom blobs from the exact seen table.
    * One shuffle of S fixed-size blobs (map-side partial merge), not of keys.
    */
  def buildBlooms(
      seen: DataFrame, // col: url_hash long
      expectedItemsPerShard: Long,
      fpp: Double = 0.01,
      shards: Int = DefaultShards): Map[Int, BloomSketch] = {
    val bloomUdaf = udaf(new BloomAgg(expectedItemsPerShard, fpp))
    seen
      .select(col("url_hash"), pmod(col("url_hash"), lit(shards)).cast("int").as("shard"))
      .groupBy(col("shard"))
      .agg(bloomUdaf(col("url_hash")).as("sketch"))
      .collect()
      .map(r => r.getInt(0) -> BloomSketch.deserialize(r.getAs[Array[Byte]](1)))
      .toMap
  }

  /** Exact dedup of `candidates` against `seen`, bloom-accelerated.
    *
    * Returns candidates whose `url_hash` is NOT in `seen`. The bloom map is
    * broadcast via the closure; rows the bloom rejects ("definitely new")
    * skip the anti-join entirely.
    */
  def filterNew(
      spark: SparkSession,
      candidates: DataFrame, // must carry url_hash long
      seen: DataFrame,       // col: url_hash long
      blooms: Map[Int, BloomSketch]): DataFrame = {
    if (blooms.isEmpty) return candidates
    val bc = spark.sparkContext.broadcast(blooms)
    val shards = blooms.size
    val maybeSeen = udf { (h: Long) =>
      bc.value.get(java.lang.Math.floorMod(h, shards)).forall(_.mightContain(h))
    }
    val flagged = candidates.withColumn("_maybe_seen", maybeSeen(col("url_hash")))
    val definitelyNew = flagged.filter(!col("_maybe_seen")).drop("_maybe_seen")
    val needCheck = flagged.filter(col("_maybe_seen")).drop("_maybe_seen")
    val confirmedNew =
      needCheck.join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }

  /** Plain exact dedup (no bloom) — used when the seen table is small or
    * blooms are not yet built (cold start).
    */
  def filterNewExact(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
}
