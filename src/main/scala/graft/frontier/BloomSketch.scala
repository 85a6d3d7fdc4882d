package graft.frontier

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A from-scratch, product-encodable Bloom filter over 64-bit keys.
  *
  * The reference keeps a 128-deep exact block-hash window
  * (/root/reference/cache/stack.go, config "cache": 128) because one chain
  * only ever has ~128 live candidates. A 10^10-URL frontier cannot: the
  * north_rule calls for partitioned Bloom/cuckoo seen-filters keyed by
  * canonicalized-URL xxhash64. This class is one shard; [[SeenSet]] manages
  * the shard map (shard = key's top bits), so each shard stays
  * executor-memory-sized and shards build in parallel with map-side combine.
  *
  * Double hashing (Kirsch–Mitzenmacher): index_i = h1 + i·h2 mod m, with h1/h2
  * derived from the already-well-mixed xxhash64 key via a finalizer step.
  * Deterministic — identical input sets give identical bits at any
  * parallelism, which the resumability tests rely on.
  */
final case class BloomSketch(bits: Array[Long], numHash: Int) {

  @inline private def m: Long = bits.length.toLong * 64L

  @inline private def mix(z0: Long): Long = {
    // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def put(key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    var h = h1
    while (i < numHash) {
      val idx = java.lang.Long.remainderUnsigned(h, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63))
      h += h2
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    var h = h1
    while (i < numHash) {
      val idx = java.lang.Long.remainderUnsigned(h, m)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  /** In-place OR-merge (shard union across partitions). */
  def mergeInPlace(other: BloomSketch): BloomSketch = {
    require(other.bits.length == bits.length && other.numHash == numHash,
      s"incompatible bloom shards: ${bits.length}/$numHash vs ${other.bits.length}/${other.numHash}")
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }

  def cardinalityBitsSet: Long = bits.map(java.lang.Long.bitCount(_).toLong).sum
}

object BloomSketch {
  /** Size a sketch for `expectedItems` at false-positive rate `fpp`. */
  def create(expectedItems: Long, fpp: Double): BloomSketch = {
    val n = math.max(expectedItems, 1L)
    val mBits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val words = math.max(1L, (mBits + 63) / 64).toInt
    val k = math.max(1, math.round(mBits.toDouble / n * math.log(2)).toInt)
    BloomSketch(new Array[Long](words), k)
  }

  /** Serialized blob size for the given sizing params (transport planning). */
  def sizeBytes(expectedItems: Long, fpp: Double): Long = {
    val n = math.max(expectedItems, 1L)
    val mBits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    8L + 8L * math.max(1L, (mBits + 63) / 64)
  }

  def deserialize(bytes: Array[Byte]): BloomSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val words = bb.getInt
    val bits = new Array[Long](words)
    var i = 0
    while (i < words) { bits(i) = bb.getLong; i += 1 }
    BloomSketch(bits, k)
  }

  def serialize(s: BloomSketch): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * s.bits.length)
    bb.putInt(s.numHash).putInt(s.bits.length)
    s.bits.foreach(bb.putLong)
    bb.array()
  }
}

/** groupBy-able Bloom build: `ds.groupBy(shard).agg(udaf(new BloomAgg(n,fpp))(col))`.
  * Map-side partial aggregation gives per-partition local sketches merged by
  * OR at the reducer — one shuffle of fixed-size blobs, not of keys.
  */
class BloomAgg(expectedItemsPerShard: Long, fpp: Double)
    extends Aggregator[Long, BloomSketch, Array[Byte]] {
  override def zero: BloomSketch = BloomSketch.create(expectedItemsPerShard, fpp)
  override def reduce(b: BloomSketch, key: Long): BloomSketch = { b.put(key); b }
  override def merge(a: BloomSketch, b: BloomSketch): BloomSketch = a.mergeInPlace(b)
  override def finish(b: BloomSketch): Array[Byte] = BloomSketch.serialize(b)
  override def bufferEncoder: Encoder[BloomSketch] = Encoders.product[BloomSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** OR-merge aggregator over already-serialized shard blobs — the per-round
  * incremental maintenance step (`persisted ∪ delta`), fully distributed:
  * blobs aggregate where they live and never funnel through the driver.
  * All inputs of a group must share sizing params ([[BloomSketch.mergeInPlace]]
  * enforces it); the zero is an empty marker, not a sized sketch, so this
  * aggregator needs no sizing knowledge of its own.
  */
class BloomMergeAgg extends Aggregator[Array[Byte], BloomSketch, Array[Byte]] {
  private def orMerge(a: BloomSketch, b: BloomSketch): BloomSketch =
    if (a.bits.isEmpty) b else if (b.bits.isEmpty) a else a.mergeInPlace(b)
  override def zero: BloomSketch = BloomSketch(Array.emptyLongArray, 0)
  override def reduce(b: BloomSketch, blob: Array[Byte]): BloomSketch =
    orMerge(b, BloomSketch.deserialize(blob))
  override def merge(a: BloomSketch, b: BloomSketch): BloomSketch = orMerge(a, b)
  override def finish(b: BloomSketch): Array[Byte] = BloomSketch.serialize(b)
  override def bufferEncoder: Encoder[BloomSketch] = Encoders.product[BloomSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
