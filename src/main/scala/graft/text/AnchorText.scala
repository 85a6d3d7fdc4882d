package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anchor-text aggregation — for every link TARGET, the most common anchor
  * texts pointing at it. The classic web-corpus signal: anchors describe a
  * page in other authors' words, often better than the page's own text
  * (the reference's chain walk has no analog — a web graph's in-links carry
  * text, a block's parent hash does not), and the aggregate feeds both
  * retrieval training pairs and crawl prioritization next to
  * [[graft.frontier.PageRank]].
  *
  * Shape for 100 TB: normalization is a pure codegen projection; the count
  * is ONE hash-aggregate on (dst, anchor) with map-side combine (the hot
  * target's duplicate anchors collapse map-side, so a 10^6-in-link page
  * arrives at the reducer as one row per DISTINCT anchor); top-k is a
  * window row_number partitioned by dst — one further exchange, but of the
  * aggregated (dst, anchor, count) rows only, tiny next to the raw link
  * input. Nothing driver-side.
  */
object AnchorText {

  /** Lowercase, trim, collapse internal whitespace — the anchor identity
    * under which "  Spark  Guide " and "spark guide" are the same vote.
    */
  def normalizeAnchor(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Top-k anchors per target: (dst, anchor, n_links, rank), rank 1 = most
    * common; ties break on the anchor string so the cut is deterministic
    * and externally replayable. Empty/whitespace-only anchors are dropped
    * (they carry no signal and on real crawls dominate raw counts).
    */
  def topAnchors(links: DataFrame, dstCol: String, anchorCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = links
      .select(col(dstCol).as("dst"), normalizeAnchor(col(anchorCol)).as("anchor"))
      .filter(length(col("anchor")) > 0)
      .groupBy("dst", "anchor").agg(count(lit(1)).as("n_links"))
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("n_links").desc, col("anchor").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
