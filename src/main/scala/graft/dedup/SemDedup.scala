package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.SimilaritySearch

/** Semantic deduplication — SemDeDup (Abbas et al., "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication", arXiv:2303.09540):
  * k-means-cluster the embedding space, then prune near-duplicate PAIRS only
  * WITHIN each cluster. This is the published answer to "pairwise cosine over
  * 10^9 vectors is O(n²)": clustering cuts the quadratic term to
  * Σ_c |cell_c|² — at k cells of roughly n/k rows, an n²/k candidate count —
  * and the within-cell work is embarrassingly parallel by cell.
  *
  * Relation to the siblings in [[Dedup]]: `embeddingNearDups` (sign-LSH) is
  * the RECALL-ORIENTED path — OR-ed bands make missing a ≥ 0.9-cosine pair
  * vanishingly unlikely, at the cost of hash-collision candidates to verify.
  * SemDeDup trades that guarantee for locality: a pair split across cells is
  * never considered (the paper accepts this; identical and near-identical
  * vectors land in the same Voronoi cell by construction), so candidates are
  * all GENUINE neighborhoods and the operator doubles as the "keep one
  * representative per semantic neighborhood" primitive the paper trains on.
  *
  * Shape for scale:
  *   - clustering reuses [[SimilaritySearch.buildIvf]]: deterministic init,
  *     Lloyd steps as zero-Exchange argmax assignment + a partial-aggregated
  *     `VecMeanAgg` (the exchange carries ≤ nlist × partitions partial sums);
  *   - the quadratic candidate join carries ONLY (cell, id) — 12-byte rows;
  *     vectors re-join BY ID after pair formation (the `embeddingNearDups`
  *     discipline: wide arrays never multiply across the self-join);
  *   - cells larger than `maxCell` are dropped from pairing — observable via
  *     [[semanticOversizeCells]], never silent. A degenerate clustering (all
  *     mass in one cell — e.g. near-duplicate boilerplate embeddings at crawl
  *     scale) degrades to a diagnostic row, not an O(n²) stage.
  *
  * Honest limit: keeping cells at a constant size means nlist ∝ n, and the
  * FLAT argmax assignment is O(n · nlist · dim) — fine to ~10^4 cells (the
  * paper's own k at 10^8 docs), quadratic-ish beyond. Past that the coarse
  * quantizer goes hierarchical (argmax over √k super-centroids, then over
  * that super-cell's sub-centroids: O(n·2√k·dim)); the seam is [[assign]] —
  * everything downstream consumes only (id, v, cell).
  */
object SemDedup {

  /** Within-cluster near-dup pairs: (id1, id2, cosine) with id1 < id2, both
    * ids in the same k-means cell, cosine ≥ `minCosine`. Sound (every emitted
    * pair really has cosine ≥ threshold — verified on raw vectors, never on
    * quantized ones); recall is within-cell by design (see object doc).
    */
  def semanticNearDups(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int = 2, minCosine: Double = 0.95,
      maxCell: Long = 10000L): DataFrame = {
    val assigned = assign(spark, df, idCol, vecCol, nlist, iters)

    val small = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxCell)
      .select("cell")
    val pruned = assigned.join(small, Seq("cell"), "left_semi")

    // narrow (cell, id) self-join; vectors re-attach by id afterwards
    val ids = pruned.select(col("cell"), col("id"))
    val candidates = ids.select(col("cell"), col("id").as("id1"))
      .join(ids.select(col("cell"), col("id").as("id2")), Seq("cell"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")

    val vs = assigned.select(col("id"), col("v"))
    candidates
      .join(vs.select(col("id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(vs.select(col("id").as("id2"), col("v").as("v2")), Seq("id2"))
      .withColumn("cosine", Dedup.cosine(col("v1"), col("v2")))
      .filter(col("cosine") >= minCosine)
      .select("id1", "id2", "cosine")
  }

  /** Diagnostic twin: cells whose population exceeds `maxCell` (and were
    * therefore excluded from pairing), with their sizes. Same contract as
    * [[Dedup.minhashOversizeBuckets]] — the cap is observable, never silent.
    */
  def semanticOversizeCells(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int = 2,
      maxCell: Long = 10000L): DataFrame =
    assign(spark, df, idCol, vecCol, nlist, iters)
      .groupBy("cell").agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") > maxCell)

  /** One representative per semantic cluster: [[Dedup.dedupCanonical]] over
    * the within-cell pair list — min id survives, singletons untouched.
    */
  def semanticSurvivors(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int = 2, minCosine: Double = 0.95,
      maxCell: Long = 10000L): DataFrame =
    Dedup.dedupCanonical(df, idCol,
      semanticNearDups(spark, df, idCol, vecCol, nlist, iters, minCosine, maxCell))

  /** (id, v, cell) assignment via the shared IVF builder (deterministic init,
    * fixed Lloyd iterations — externally replayable, the oracle contract).
    */
  private def assign(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int): DataFrame =
    SimilaritySearch.buildIvf(spark, df, idCol, vecCol, nlist, iters).assigned
}
