package graft.tools

import graft.functions.UrlCodec

/** r6 measurement (guide §1): per-call cost of URL canonicalization — the
  * frontier gate runs it twice over every candidate per round (the dedup
  * union's two branches), so its constant factor is a direct term in the
  * round time. Pure JVM micro-bench, no Spark session.
  */
object DriveUrlPerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    // the exact synthetic-frontier shape Bench.genFrontier feeds it
    val urls = (0 until n).map(i =>
      s"HTTP://Host${i % 256}.Example.COM:80/p/./x/../$i#f").toArray
    val plain = (0 until n).map(i =>
      s"https://host${i % 256}.example.com/p/$i?q=1").toArray

    def bench(label: String, data: Array[String], reps: Int): Unit = {
      var sink = 0
      var r = 0
      // warm
      var i = 0
      while (i < data.length) { sink ^= UrlCodec.canonicalize(data(i)).length; i += 1 }
      val t0 = System.nanoTime()
      r = 0
      while (r < reps) {
        i = 0
        while (i < data.length) {
          sink ^= UrlCodec.canonicalize(data(i)).length
          i += 1
        }
        r += 1
      }
      val ns = (System.nanoTime() - t0).toDouble / (reps.toLong * data.length)
      println(f"URLPERF $label%-18s $ns%8.1f ns/call (sink=${sink & 1})")
    }
    bench("bench_shape", urls, 5)
    bench("plain_shape", plain, 5)
  }
}
