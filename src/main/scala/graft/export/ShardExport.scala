package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Balanced training-shard assignment — the export step of a training-data
  * pipeline (WebDataset/TFRecord style): pack rows, in a deterministic total
  * order, into shards of ~`targetSize` payload bytes each, so a downstream
  * loader streams fixed-size files with a reproducible row→shard mapping.
  *
  * Semantics: with rows ordered by `orderCol` (a UNIQUE key — ties would make
  * the prefix sum engine-dependent) and `start(r)` = exclusive prefix sum of
  * `sizeCol`, a row lands in `shard_id = floor(start(r) / targetSize)`. Every
  * shard therefore holds ≥ targetSize bytes except the last, and no shard
  * exceeds targetSize + max row size. This closed form replays in any SQL
  * engine as one window expression, which is exactly what the oracle does.
  *
  * Scale shape — the whole point of this operator: the obvious
  * `Window.orderBy(orderCol)` with no partition key plans as a SINGLE
  * PARTITION sort (Exchange SinglePartition) — the entire corpus through one
  * reducer, the canonical 100 TB failure. Instead, the classic two-phase
  * distributed scan:
  *   1. range-repartition on the order key (Spark's RangePartitioner samples
  *      deterministically per input split, so both consumers of the ranged
  *      child see the same boundaries);
  *   2. per-partition running sum via a window PARTITIONED by the physical
  *      partition id — P concurrent sorts, each over 1/P of the data;
  *   3. a P-row per-partition-total table, turned into exclusive offsets by
  *      a window over those P rows (O(P) metadata, the same bounded-driver
  *      argument as the bloom-blob collect), broadcast-joined back.
  * Nothing global ever materializes on one node; the only O(n) exchanges are
  * the range partition and the window's pid clustering, both narrow
  * (order key + size ride the shuffle, payload columns are pruned until the
  * final projection when callers select them back in).
  */
object ShardExport {

  /** Adds `shard_id` (long) to `df`. `orderCol` must be a unique, totally
    * ordered key (doc_id, url_hash…); `sizeCol` a non-negative long/int
    * payload size; `targetSize` the shard payload target in the same unit.
    */
  def assignShards(df: DataFrame, orderCol: String, sizeCol: String,
      targetSize: Long, partitions: Int = 0): DataFrame = {
    require(targetSize > 0, s"targetSize must be positive, got $targetSize")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val ranged = df.repartitionByRange(p, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ranged.withColumn("__cum",
      sum(col(sizeCol).cast("long")).over(local))

    // P rows only: per-partition totals → exclusive prefix offsets. The
    // single-partition window here is over the P-row aggregate, not the data.
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col(sizeCol).cast("long")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))

    cum.join(broadcast(offsets), "__pid")
      .withColumn("shard_id",
        floor((col("__off") + col("__cum") - col(sizeCol).cast("long")) /
          lit(targetSize.toDouble)))
      .drop("__pid", "__cum", "__off")
  }

  /** Per-shard manifest (row count + payload bytes) — what the export writes
    * next to the shards so a loader can size-check without reading them.
    * One hash-aggregate over the assigned frame.
    */
  def manifest(assigned: DataFrame, sizeCol: String): DataFrame =
    assigned.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sizeCol).cast("long")).as("n_bytes"))
}
