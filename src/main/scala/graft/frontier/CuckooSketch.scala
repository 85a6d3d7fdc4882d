package graft.frontier

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A from-scratch (2,4) cuckoo filter over 64-bit keys — the second of the
  * two approximate-membership structures the north rule names
  * ("partitioned Bloom/cuckoo filters"). One shard; [[CuckooSet]] manages
  * the shard map exactly like [[SeenSet]] does for blooms.
  *
  * Partial-key cuckoo hashing (Fan, Andersen, Kaminsky, Mitzenmacher,
  * "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public
  * paper): each key stores a 16-bit fingerprint in one of two buckets of 4
  * slots; bucket 2 = bucket 1 XOR hash(fingerprint), so relocation needs
  * only the stored fingerprint. What it buys over the bloom shard:
  *
  *  - DELETION: a retracted URL can be REMOVED from the filter. The bloom
  *    accumulates every tombstoned key as a permanent maybe-seen positive;
  *    over a long crawl with revisions that inflates the exact-check
  *    fraction without bound. Deleting only keys that were actually
  *    inserted keeps the no-false-negative guarantee intact.
  *  - Lower fpp per bit at this sizing: 16-bit fingerprints probe 8 slots
  *    → fpp ≈ 8/2^16 ≈ 1.2e-4 vs the bloom's 1e-2.
  *
  * Unlike the bloom, the physical slot layout depends on insertion/merge
  * order (eviction paths differ), so blobs are NOT bit-identical across
  * runs — but the membership ANSWERS are order-independent for any
  * insert/delete history that only deletes inserted keys, which is the
  * contract [[CuckooSet.filterNew]] relies on (CuckooFilterSpec pins it).
  *
  * `buckets` is a power of two so the XOR partner stays in range and the
  * pairing is an involution.
  */
final case class CuckooSketch(table: Array[Short], bucketsLog2: Int) {

  @inline private def buckets: Int = 1 << bucketsLog2
  @inline private def mask: Int = buckets - 1

  @inline private def mix(z0: Long): Long = {
    // splitmix64 finalizer (same as BloomSketch — keys are pre-mixed
    // xxhash64, this decorrelates fingerprint from bucket index)
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 16-bit fingerprint, never 0 (0 marks an empty slot). */
  @inline private def fpOf(h: Long): Short = {
    val f = (h & 0xffffL).toShort
    if (f == 0) 1.toShort else f
  }
  @inline private def i1Of(h: Long): Int = ((h >>> 16) & mask).toInt
  @inline private[frontier] def altIndex(i: Int, fp: Short): Int =
    i ^ (mix(fp.toLong & 0xffffL) & mask).toInt

  @inline private def slotBase(i: Int): Int = i << 2

  private def tryInsertAt(i: Int, fp: Short): Boolean = {
    val b = slotBase(i)
    var s = 0
    while (s < 4) {
      if (table(b + s) == 0) { table(b + s) = fp; return true }
      s += 1
    }
    false
  }

  /** Insert a key; false = filter over capacity (caller must size with
    * slack — [[CuckooSketch.create]] targets ≤ 0.9 load where 500-kick
    * random-walk insertion essentially never fails).
    */
  def insert(key: Long): Boolean = {
    val h = mix(key)
    val fp = fpOf(h)
    val i1 = i1Of(h)
    insertFp(i1, fp)
  }

  /** Insert a fingerprint already resident at bucket `i` (merge path) or
    * freshly derived (insert path). Deterministic eviction walk: the victim
    * slot is derived from the kicked fingerprint and the iteration count.
    */
  private[frontier] def insertFp(i0: Int, fp0: Short): Boolean = {
    if (tryInsertAt(i0, fp0) || tryInsertAt(altIndex(i0, fp0), fp0)) return true
    var i = altIndex(i0, fp0)
    var fp = fp0
    var kick = 0
    while (kick < 500) {
      val b = slotBase(i)
      val victim = (mix(fp.toLong ^ kick.toLong) & 3L).toInt
      val out = table(b + victim)
      table(b + victim) = fp
      fp = out
      i = altIndex(i, fp)
      if (tryInsertAt(i, fp)) return true
      kick += 1
    }
    false
  }

  /** Remove one stored copy of the key's fingerprint. Only call for keys
    * that were inserted — deleting a never-inserted key can evict a
    * colliding entry and break the no-false-negative guarantee (the
    * standard cuckoo-filter contract).
    */
  def delete(key: Long): Boolean = {
    val h = mix(key)
    val fp = fpOf(h)
    val i1 = i1Of(h)
    deleteAt(i1, fp) || deleteAt(altIndex(i1, fp), fp)
  }

  private def deleteAt(i: Int, fp: Short): Boolean = {
    val b = slotBase(i)
    var s = 0
    while (s < 4) {
      if (table(b + s) == fp) { table(b + s) = 0; return true }
      s += 1
    }
    false
  }

  def mightContain(key: Long): Boolean = {
    val h = mix(key)
    val fp = fpOf(h)
    val i1 = i1Of(h)
    containsAt(i1, fp) || containsAt(altIndex(i1, fp), fp)
  }

  private def containsAt(i: Int, fp: Short): Boolean = {
    val b = slotBase(i)
    table(b) == fp || table(b + 1) == fp || table(b + 2) == fp || table(b + 3) == fp
  }

  /** Merge by re-inserting the other's resident fingerprints at their
    * bucket index (the index, not the key, is what relocation needs).
    * Requires identical geometry; throws if the union exceeds capacity.
    */
  def mergeInPlace(other: CuckooSketch): CuckooSketch = {
    require(other.bucketsLog2 == bucketsLog2,
      s"incompatible cuckoo shards: 2^$bucketsLog2 vs 2^${other.bucketsLog2} buckets")
    var i = 0
    while (i < other.table.length) {
      val fp = other.table(i)
      if (fp != 0) {
        require(insertFp(i >> 2, fp),
          s"cuckoo merge overflow at load ${occupied.toDouble / table.length}")
      }
      i += 1
    }
    this
  }

  def occupied: Int = {
    var n = 0; var i = 0
    while (i < table.length) { if (table(i) != 0) n += 1; i += 1 }
    n
  }
}

object CuckooSketch {
  /** Size for `expectedItems` at ≤ 0.9 load (power-of-two buckets of 4). */
  def create(expectedItems: Long): CuckooSketch = {
    val slotsNeeded = math.max(4L, math.ceil(expectedItems / 0.9).toLong)
    var log2 = 0
    while ((4L << log2) < slotsNeeded) log2 += 1
    CuckooSketch(new Array[Short](4 << log2), log2)
  }

  def serialize(s: CuckooSketch): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 2 * s.table.length)
    bb.putInt(s.bucketsLog2)
    s.table.foreach(bb.putShort)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): CuckooSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val log2 = bb.getInt
    val table = new Array[Short](4 << log2)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    CuckooSketch(table, log2)
  }
}

/** groupBy-able cuckoo build (the [[BloomAgg]] pattern): map-side partials
  * hold one shard-sized table per (task × shard) — [[CuckooSet]] routes keys
  * to their shard's partition first for exactly the reason [[SeenSet
  * .bloomDelta]] documents.
  */
class CuckooAgg(expectedItemsPerShard: Long)
    extends Aggregator[Long, CuckooSketch, Array[Byte]] {
  override def zero: CuckooSketch = CuckooSketch.create(expectedItemsPerShard)
  override def reduce(b: CuckooSketch, key: Long): CuckooSketch = {
    require(b.insert(key), "cuckoo shard overflow: size expectedItemsPerShard up")
    b
  }
  override def merge(a: CuckooSketch, b: CuckooSketch): CuckooSketch =
    if (a.occupied >= b.occupied) a.mergeInPlace(b) else b.mergeInPlace(a)
  override def finish(b: CuckooSketch): Array[Byte] = CuckooSketch.serialize(b)
  override def bufferEncoder: Encoder[CuckooSketch] = Encoders.product[CuckooSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merge aggregator over serialized shard blobs (`persisted ∪ delta`),
  * distributed like [[BloomMergeAgg]]; geometry mismatches throw.
  */
class CuckooMergeAgg extends Aggregator[Array[Byte], CuckooSketch, Array[Byte]] {
  private def m(a: CuckooSketch, b: CuckooSketch): CuckooSketch =
    if (a.table.isEmpty) b else if (b.table.isEmpty) a
    else if (a.occupied >= b.occupied) a.mergeInPlace(b) else b.mergeInPlace(a)
  override def zero: CuckooSketch = CuckooSketch(Array.emptyShortArray, 0)
  override def reduce(b: CuckooSketch, blob: Array[Byte]): CuckooSketch =
    m(b, CuckooSketch.deserialize(blob))
  override def merge(a: CuckooSketch, b: CuckooSketch): CuckooSketch = m(a, b)
  override def finish(b: CuckooSketch): Array[Byte] = CuckooSketch.serialize(b)
  override def bufferEncoder: Encoder[CuckooSketch] = Encoders.product[CuckooSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
