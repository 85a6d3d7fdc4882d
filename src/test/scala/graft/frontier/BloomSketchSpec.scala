package graft.frontier

import org.scalatest.funsuite.AnyFunSuite

class BloomSketchSpec extends AnyFunSuite {

  test("no false negatives; FPR within 3x of target") {
    val n = 100000
    val sketch = BloomSketch.create(n, 0.01)
    val rnd = new scala.util.Random(42)
    val keys = Array.fill(n)(rnd.nextLong())
    keys.foreach(sketch.put)
    assert(keys.forall(sketch.mightContain), "false negative!")
    val probes = Array.fill(n)(rnd.nextLong()).filterNot(keys.contains)
    val fp = probes.count(sketch.mightContain).toDouble / probes.length
    assert(fp < 0.03, s"observed FPR $fp")
  }

  test("merge equals sequential build (determinism at any parallelism)") {
    val a = BloomSketch.create(1000, 0.01)
    val b = BloomSketch.create(1000, 0.01)
    val whole = BloomSketch.create(1000, 0.01)
    (0L until 500L).foreach { k => a.put(k); whole.put(k) }
    (500L until 1000L).foreach { k => b.put(k); whole.put(k) }
    a.mergeInPlace(b)
    assert(a.bits.toSeq === whole.bits.toSeq)
  }

  test("serialization round-trip") {
    val s = BloomSketch.create(100, 0.01)
    (0L until 100L).foreach(s.put)
    val back = BloomSketch.deserialize(BloomSketch.serialize(s))
    assert(back.numHash === s.numHash)
    assert(back.bits.toSeq === s.bits.toSeq)
    assert((0L until 100L).forall(back.mightContain))
  }
}
