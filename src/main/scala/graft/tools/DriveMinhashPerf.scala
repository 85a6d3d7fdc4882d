package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r6 measurement (guide §1): where does q_minhash_neardups' time go?
  * Times the staged prefixes with a noop sink so the numbers isolate
  * compute. Not part of the driver contract.
  */
object DriveMinhashPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timeIt(label: String, df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MPERF $label%-24s ${ts.min}%.3f s")
    }

    // stage 0: shingle projection only (no checkpoint)
    timeIt("shingles_only", docs.select(col("doc_id").as("id"),
      sort_array(Dedup.wordShingleHashes(col("text"), 3)).as("shingles")))

    // stage 1: shingles + signature + bands (the checkpointed projection)
    timeIt("sigs_projection", docs.select(col("doc_id").as("id"),
      sort_array(Dedup.wordShingleHashes(col("text"), 3)).as("shingles"))
      .withColumn("band_hash",
        Dedup.lshBands(Dedup.minhashSignature(col("shingles"), 32), 8, 4)))

    // full operator (includes the localCheckpoint + joins + verify)
    timeIt("full", Dedup.minhashNearDups(docs, "doc_id", "text"))
    spark.stop()
  }
}
