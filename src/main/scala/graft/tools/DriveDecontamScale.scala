package graft.tools

import graft.text.Decontaminate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence for the decontamination scale contract: overlap() must be
  * LINEAR in corpus size (the 100 TB side — one explode + broadcast
  * semi-join + partial agg, no corpus shuffle) and close to FLAT in eval
  * size at fixed match volume (eval grams ride a broadcast; making the
  * benchmark bigger must not re-shape the corpus-side plan).
  *
  * Corpus is the sf documents table replicated K× under shifted doc_ids
  * (same text → same match structure per copy); eval sets are id-sampled
  * slices. Each timing is min-of-reps after a discarded warm run.
  *
  *   sbt -batch 'runMain graft.tools.DriveDecontamScale /root/testdata/sf0.1 8 3'
  */
object DriveDecontamScale {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = a.drop(1).headOption.map(_.toInt).getOrElse(8)
    val reps = a.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.get(cores)
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val nBase = base.count()

    def corpusX(k: Int): DataFrame =
      (0 until k).map(c => base.select(
        (col("doc_id") + lit(c.toLong * 1000000000L)).as("doc_id"), col("text")))
        .reduce(_ union _)

    def evalEvery(modulus: Int): DataFrame =
      base.filter(col("doc_id") % modulus === 0).select("text")

    def timed(corpus: DataFrame, eval: DataFrame): (Double, Long) = {
      var rows = 0L
      def run(): Double = {
        val t0 = System.nanoTime()
        rows = Decontaminate.overlap(corpus, "doc_id", "text", eval, "text").count()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm (discarded)
      ((1 to reps).map(_ => run()).min, rows)
    }

    // axis 1: corpus size at fixed eval (every 37th base doc)
    val (t1, r1) = timed(corpusX(1), evalEvery(37))
    val (t10, r10) = timed(corpusX(10), evalEvery(37))
    println(f"DECONTAM corpus  1x: n=${nBase}%d flagged=$r1%d secs=$t1%.3f")
    println(f"DECONTAM corpus 10x: n=${nBase * 10}%d flagged=$r10%d secs=$t10%.3f " +
      f"ratio=${t10 / t1}%.2f (linear => ~10, sublinear is fine)")

    // axis 2: eval size at fixed corpus (1x): every 37th vs every 4th doc
    val (te1, _) = timed(corpusX(1), evalEvery(37))
    val (te10, _) = timed(corpusX(1), evalEvery(4))
    println(f"DECONTAM eval small: secs=$te1%.3f  eval ~9x bigger: secs=$te10%.3f " +
      f"ratio=${te10 / te1}%.2f (broadcast side — must stay well under the eval growth)")

    spark.stop()
  }
}
