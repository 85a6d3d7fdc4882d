package graft.tools

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r6 measurement: where does q_token_jaccard's time go? Times the staged
  * variants with a noop sink (guide §1.4) so the numbers isolate compute.
  * Not part of the driver contract.
  */
object DriveJaccardPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("len_bucket", floor(col("n_chars") / 100))
    val blockCols = Seq("lang", "len_bucket")

    def timeIt(label: String, df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"JPERF $label%-28s ${ts.min}%.3f s")
    }

    val base = docs.select((col("doc_id").as("id") +:
      sort_array(array_distinct(TextAnalysis.tokens(col("text")))).as("toks") +:
      blockCols.map(col)): _*)
      .withColumn("nt", size(col("toks")))

    // 0: just the per-doc prep
    timeIt("prep_only", base)

    // 1: join only, ids+counts, no arrays at all (counts the pair volume)
    val lN = base.select((col("id").as("id1") +: col("nt").as("n1") +: blockCols.map(col)): _*)
    val rN = base.select((col("id").as("id2") +: col("nt").as("n2") +: blockCols.map(col)): _*)
    timeIt("pairs_no_arrays",
      lN.join(rN, blockCols).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"), col("n1"), col("n2")))

    // 2: full current shape (arrays ride the join)
    val l = base.select((col("id").as("id1") +: col("toks").as("t1") +:
      col("nt").as("n1") +: blockCols.map(col)): _*)
    val r = base.select((col("id").as("id2") +: col("toks").as("t2") +:
      col("nt").as("n2") +: blockCols.map(col)): _*)
    def full(lhs: DataFrame, rhs: DataFrame, t1: String, t2: String) =
      lhs.join(rhs, blockCols)
        .filter(col("id1") < col("id2"))
        .filter(least(col("n1"), col("n2")).cast("double") /
          greatest(col("n1"), col("n2")) >= 0.55)
        .withColumn("inter",
          graft.functions.ArraySetOps.sorted_intersect_count(col(t1), col(t2))
            .cast("double"))
        .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.55)
        .select("id1", "id2", "jaccard")
    timeIt("full_string_arrays", full(l, r, "t1", "t2"))

    // 3: hashed-token variant (long arrays through the join)
    val baseH = docs.select((col("doc_id").as("id") +:
      sort_array(transform(array_distinct(TextAnalysis.tokens(col("text"))),
        t => xxhash64(t))).as("toks") +:
      blockCols.map(col)): _*)
      .withColumn("nt", size(col("toks")))
    val lH = baseH.select((col("id").as("id1") +: col("toks").as("t1") +:
      col("nt").as("n1") +: blockCols.map(col)): _*)
    val rH = baseH.select((col("id").as("id2") +: col("toks").as("t2") +:
      col("nt").as("n2") +: blockCols.map(col)): _*)
    timeIt("full_hashed_arrays", full(lH, rH, "t1", "t2"))

    // 4: localCheckpoint the prep (is the per-side recompute visible?)
    val baseC = base.localCheckpoint(true)
    val lC = baseC.select((col("id").as("id1") +: col("toks").as("t1") +:
      col("nt").as("n1") +: blockCols.map(col)): _*)
    val rC = baseC.select((col("id").as("id2") +: col("toks").as("t2") +:
      col("nt").as("n2") +: blockCols.map(col)): _*)
    timeIt("full_checkpointed_prep", full(lC, rC, "t1", "t2"))

    // 5: salted block split (breaks the 451-doc straggler block into slices)
    spark.stop()
  }
}
