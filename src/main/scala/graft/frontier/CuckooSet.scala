package graft.frontier

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Sharded [[CuckooSketch]] management — the cuckoo twin of [[SeenSet]]
  * (north_rule: "partitioned Bloom/cuckoo filters"), same shard key
  * (`pmod(url_hash, S)`), same dense-table discipline, same probe-inside-
  * codegen design. The operational difference is [[applyDeletes]]: a
  * retraction round REMOVES its keys from the filter, so the maybe-seen
  * fraction tracks the LIVE member set instead of accumulating every
  * tombstone forever the way an OR-only bloom must. fpp at this sizing is
  * ~1.2e-4 (16-bit fingerprints, 8 probed slots) vs the bloom's 1e-2, at
  * ~2.2 bytes/key vs the bloom's ~1.2 — the classic cuckoo trade.
  */
object CuckooSet {

  val DefaultShards: Int = SeenSet.DefaultShards

  /** Uniform shard access for the probe expression; modulus from the
    * build-time shard count only (the [[SeenSet.BloomShardProvider]] rule:
    * a drifted modulus is a false NEGATIVE).
    */
  trait CuckooShardProvider extends Serializable {
    def shards: Int
    def shard(i: Int): CuckooSketch
    final def mightContain(h: Long): Boolean =
      shard(java.lang.Math.floorMod(h, shards.toLong).toInt).mightContain(h)
  }

  final case class BroadcastCuckooProvider(bc: Broadcast[Array[CuckooSketch]])
      extends CuckooShardProvider {
    def shards: Int = bc.value.length
    def shard(i: Int): CuckooSketch = bc.value(i)
  }

  /** Per-shard cuckoo build from a batch of adds — `(shard, sketch)` rows.
    * Keys are routed to their shard's partition BEFORE aggregating, for the
    * buffer-sizing reason [[SeenSet.bloomDelta]] documents (a map-side
    * partial would allocate a full shard-capacity table per task × shard).
    */
  def buildCuckooDf(adds: DataFrame, capPerShard: Long,
      shards: Int = DefaultShards): DataFrame = {
    val agg = udaf(new CuckooAgg(capPerShard))
    val spark = adds.sparkSession
    import spark.implicits._
    val built = adds
      .select(col("url_hash"), pmod(col("url_hash"), lit(shards)).cast("int").as("shard"))
      .repartition(shards, col("shard"))
      .groupBy(col("shard"))
      .agg(agg(col("url_hash")).as("sketch"))
    // densify: every shard present so providers can never mis-derive S
    val empty = CuckooSketch.serialize(CuckooSketch.create(capPerShard))
    val dense = (0 until shards).map(i => (i, empty)).toDF("shard", "sketch")
    val mergeAgg = udaf(new CuckooMergeAgg)
    built.unionByName(dense).groupBy(col("shard"))
      .agg(mergeAgg(col("sketch")).as("sketch"))
  }

  /** Remove a batch of retracted keys from their shards — O(delta): only
    * shards with deletions rewrite, blobs stay put on their executors.
    * Delete-only-inserted is the caller's contract ([[CuckooSketch.delete]]).
    */
  def applyDeletes(cuckoos: DataFrame, dels: DataFrame): DataFrame = {
    val spark = cuckoos.sparkSession
    import spark.implicits._
    val byShard = dels
      .select(pmod(col("url_hash"), lit(size_of(cuckoos))).cast("int").as("shard"),
        col("url_hash"))
      .groupBy(col("shard")).agg(collect_list(col("url_hash")).as("dels"))
    cuckoos.join(byShard, Seq("shard"), "left")
      .select(col("shard"), col("sketch"), col("dels"))
      .as[(Int, Array[Byte], Option[Seq[Long]])]
      .map { case (shard, blob, ds) =>
        ds match {
          case None | Some(Seq()) => (shard, blob)
          case Some(keys) =>
            val sk = CuckooSketch.deserialize(blob)
            keys.foreach(sk.delete)
            (shard, CuckooSketch.serialize(sk))
        }
      }
      .toDF("shard", "sketch")
  }

  /** The shard count of a dense cuckoo table (one count; tables are tiny). */
  private def size_of(cuckoos: DataFrame): Int = cuckoos.count().toInt

  def broadcastProvider(spark: SparkSession, cuckoos: DataFrame): BroadcastCuckooProvider = {
    val rows = cuckoos.select("shard", "sketch").collect()
    val arr = new Array[CuckooSketch](rows.length)
    rows.foreach(r => arr(r.getInt(0)) = CuckooSketch.deserialize(r.getAs[Array[Byte]](1)))
    require(!arr.contains(null), s"cuckoo table is not dense: ${rows.length} rows")
    BroadcastCuckooProvider(spark.sparkContext.broadcast(arr))
  }

  /** `cuckoo_might_contain(url_hash)` — codegen scalar probe, one
    * static-shaped call per row inside the WholeStageCodegen span (the
    * [[SeenSet.BloomMightContain]] design).
    */
  case class CuckooMightContain(child: Expression, provider: CuckooShardProvider)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      provider.mightContain(v.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cuckooProvider", provider,
        classOf[CuckooShardProvider].getName)
      defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
    }
    override protected def withNewChildInternal(c: Expression): CuckooMightContain =
      copy(child = c)
    override def prettyName: String = "cuckoo_might_contain"
  }

  def cuckoo_might_contain(c: Column, provider: CuckooShardProvider): Column =
    Bridge.column(CuckooMightContain(Bridge.expression(c), provider))

  /** Exact dedup of `candidates` against `seen`, cuckoo-accelerated — the
    * [[SeenSet.filterNew]] contract: "definitely new" rows skip the
    * anti-join, "maybe seen" rows are re-checked exactly, the union is
    * exact because the filter has no false negatives for inserted (and not
    * deleted) keys.
    */
  def filterNew(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
      provider: CuckooShardProvider): DataFrame = {
    val flagged = candidates
      .withColumn("_maybe_seen", cuckoo_might_contain(col("url_hash"), provider))
    val definitelyNew = flagged.filter(!col("_maybe_seen")).drop("_maybe_seen")
    val needCheck = flagged.filter(col("_maybe_seen")).drop("_maybe_seen")
    val confirmedNew =
      needCheck.join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }
}
