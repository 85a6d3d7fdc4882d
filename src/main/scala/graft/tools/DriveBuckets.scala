package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-shot diagnostic: largest simhash/phash band-bucket sizes on the
  * driver's documents tables — guards the invariant that the default
  * `maxBucket` cap never fires there (the DuckDB oracles replay the banding
  * UNCAPPED, so a cap that fires at oracle SF would diverge the compare).
  */
object DriveBuckets {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(16)
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val top = Dedup.simhashOversizeBuckets(docs, "doc_id", "text", maxBucket = 0L)
        .agg(max("bucket_n")).head().getLong(0)
      println(s"$sf simhash max bucket = $top (docs = ${docs.count()})")
    }
    spark.stop()
  }
}
