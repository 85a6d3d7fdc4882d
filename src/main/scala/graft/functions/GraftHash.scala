package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Driver/oracle-side hashing that is bit-identical to Spark's builtin
  * `xxhash64` column function (seed 42), so the single-threaded reference
  * walker and the distributed engine key URLs identically.
  */
object GraftHash {
  val SparkSeed = 42L

  def xxhash64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, SparkSeed)
  }

  def xxhash64(l: Long): Long = XXH64.hashLong(l, SparkSeed)

  /** splitmix64 finalizer — generic deterministic mixing for fixtures. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mix64(a: Long, b: Long): Long = mix64(mix64(a) ^ b)
}
