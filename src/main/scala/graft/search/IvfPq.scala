package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVFADC — the composition of the two scale levers this package already
  * has (Jégou et al. TPAMI 2011 §V: "IVFADC"): the IVF coarse quantizer
  * prunes the SCAN (a probe touches ~nprobe/nlist of the table) and
  * product quantization shrinks what the scan READS (m byte-codes per
  * row, never the raw vector). The index stores (id, cell, codes) — at
  * 10^10 rows × 64 float dims that is ~20 B/row against 256 B/row of raw
  * embeddings, and written partitioned by `cell` the probe's filter
  * prunes whole files before any IO.
  *
  * PQ codes quantize the RESIDUAL v − centroid(cell), not v: residuals
  * concentrate near 0 with far smaller spread than raw vectors, so the
  * same (m, ksub) budget spends its codes on the part of v the coarse
  * quantizer hasn't already explained. One shared residual codebook
  * serves every cell (the paper's memory/accuracy compromise).
  *
  * Search = driver-side probe selection (centroids are index metadata) +
  * ONE filtered scan of the codes table summing ADC lookups from the
  * probed cells' per-cell distance tables (a map literal keyed by cell —
  * nprobe · m · ksub doubles), a shortlist TakeOrderedAndProject, and the
  * [[ProductQuant.searchAdcRerank]] exact re-rank: the shortlist
  * broadcast-joins back to the vector table, so raw vectors are touched
  * for `shortlist` rows only and the big side never shuffles.
  *
  * The metric is squared L2 end-to-end (PQ-native; for cosine, L2 over
  * pre-normalized vectors ranks identically). Note the coarse ASSIGNMENT
  * reuses [[SimilaritySearch.buildIvf]]'s cosine cells while probe
  * selection and ADC are L2 — on these unit-scale synthetic embeddings
  * the two agree closely, and the re-rank pass makes the final ranking
  * exact on whatever survives the shortlist either way.
  */
object IvfPq {

  /** centroids = coarse cells; cb = shared residual codebook; codes =
    * (id, cell, codes) — the only per-row state, NO raw vectors.
    */
  final case class IvfPqIndex(centroids: Array[(Int, Array[Double])],
      cb: ProductQuant.PqCodebook, codes: DataFrame)

  private def centroidMapLit(cents: Array[(Int, Array[Double])]): Column =
    map(cents.flatMap { case (cell, c) => Seq(lit(cell), lit(c)) }: _*)

  /** Build: IVF coarse cells → per-row residuals (one projection against
    * the centroid map literal — no join) → PQ train/encode on residuals.
    */
  def build(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, m: Int, ksub: Int,
      iters: Int = 3): IvfPqIndex = {
    val ivf = SimilaritySearch.buildIvf(spark, df, idCol, vecCol, nlist, iters)
    val cmap = centroidMapLit(ivf.centroids)
    val resid = ivf.assigned.select(col("id"), col("cell"),
      zip_with(col("v"), element_at(cmap, col("cell")),
        (x, c) => x - c).as("r"))
    val cb = ProductQuant.train(spark, resid, "id", "r", m, ksub, iters)
    val codes = ProductQuant.encode(resid, "id", "r", cb, keep = Seq("cell"))
    IvfPqIndex(ivf.centroids, cb, codes)
  }

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** ADC shortlist over the `nprobe` nearest cells + exact re-rank on the
    * survivors: emits (id, l2sq) — the exact metric on the approximate
    * candidate set, (l2sq, id)-ordered, top `k`.
    */
  def search(idx: IvfPqIndex, vectors: DataFrame, idCol: String,
      vecCol: String, query: Array[Double], k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val probed = idx.centroids.sortBy { case (cell, c) => (l2(c, query), cell) }
      .take(math.min(nprobe, idx.centroids.length))
    // per-cell residual distance tables: dt_cell built from (q − c_cell),
    // so Σⱼ dt(codeⱼ) ≈ ‖q − (c_cell + r̂)‖² = the full approximate L2
    val dtMap = map(probed.flatMap { case (cell, c) =>
      val qr = query.indices.map(i => query(i) - c(i)).toArray
      Seq(lit(cell), lit(ProductQuant.distanceTable(idx.cb, qr)))
    }: _*)
    val dt = element_at(dtMap, col("cell"))
    val adc = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(idx.cb.m - 1)),
        (cd, j) => element_at(dt, (j * idx.cb.ksub + cd + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
    val cand = idx.codes
      .filter(col("cell").isin(probed.map(_._1.asInstanceOf[Any]): _*))
      .select(col("id"), adc.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(shortlist)
      .select("id")
    vectors.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(cand), "id")
      // r6: native vec_l2sq kernel — same ascending fold, bit-identical
      .select(col("id"),
        round(graft.functions.VecOps.vec_l2sq(col("v"), lit(query)), 6).as("l2sq"))
      .orderBy(col("l2sq").asc, col("id").asc)
      .limit(k)
  }
}
