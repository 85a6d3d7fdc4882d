package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Compression-ratio quality signal (the Gopher / CCNet repetition filter
  * family): deflate(text).length / text.length. Templated, repeated, or
  * machine-generated text compresses far harder than natural prose, so a
  * LOW ratio flags the same pathologies [[Repetition]] measures — but
  * holistically, catching long-range repetition that line/bigram censuses
  * miss (a page whose every PARAGRAPH repeats has unique lines and diverse
  * bigrams, yet deflates to almost nothing).
  *
  * Shape for scale: Spark has no built-in deflate, so this is a typed
  * `mapPartitions` (the [[graft.multimodal.Multimodal]] pattern — one
  * java.util.zip.Deflater REUSED across the partition's rows, reset per
  * row; allocation cost amortized, nothing on the driver, no scalar UDF
  * in a groupBy/join path). Output is one narrow row per doc; the stage
  * is embarrassingly parallel scan work at any corpus size.
  *
  * Determinism: for a fixed zlib level the deflate byte LENGTH is a pure
  * function of the input on a given zlib build; the driver-facing flag
  * (`is_repetitive` = ratio < threshold) additionally carries ≥ 0.15
  * margin on both sides of the fixture classes, so it is stable across
  * zlib versions too.
  */
object CompressionRatio {

  final case class DocCompression(doc_id: Long, n_raw: Int, n_deflate: Int,
      ratio: Double)

  /** (doc_id, n_raw, n_deflate, ratio) per document; `level` is the zlib
    * level (default 6, zlib's own default). Empty text yields ratio 0.
    */
  def deflateRatio(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, level: Int = 6): DataFrame = {
    import spark.implicits._
    df.selectExpr(s"CAST($idCol AS LONG) AS id", s"$textCol AS text")
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        // release the Deflater's native memory when the task ends (ADVICE
        // r5): without end(), each task's native buffer lives until GC
        // finalization — across many tasks of a long job that accumulates
        // off-heap
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var n = 0
          while (!deflater.finished()) n += deflater.deflate(buf)
          DocCompression(id, raw.length, n,
            if (raw.length > 0) n.toDouble / raw.length else 0.0)
        }
      }.toDF()
  }

  /** The admission-filter view: `is_repetitive` = 1 where the deflate
    * ratio is below `threshold` (default 0.35 — natural prose lands
    * 0.4–0.7, hard repetition under 0.1).
    */
  def repetitiveFlags(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.35): DataFrame = {
    import org.apache.spark.sql.functions._
    deflateRatio(spark, df, idCol, textCol)
      .select(col("doc_id").as(idCol),
        (col("ratio") < threshold).cast("int").as("is_repetitive"))
  }
}
