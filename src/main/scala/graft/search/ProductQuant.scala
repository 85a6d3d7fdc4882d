package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-bounded scale path for embedding
  * search (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): split each dim-D vector into `m` subvectors of
  * D/m dims, k-means each subspace to `ksub` centroids, and store each
  * vector as `m` small codes. A 64-dim float vector (256 B) becomes m=8
  * bytes — a 10^10-row embedding table's index fits where the raw vectors
  * never would, and queries scan codes with table lookups (ADC) instead of
  * float dot products.
  *
  * Scale shape:
  *   - TRAIN ([[train]]): per Lloyd iteration ONE job — a Generate to
  *     (row × subspace) slices feeding a partial-aggregated
  *     groupBy(sub, code) vector-mean; the exchange carries only
  *     m·ksub·partitions partial sums (the [[SimilaritySearch]] VecMeanAgg
  *     argument), never the exploded rows. Assignment is a per-row argmin
  *     expression over the centroid literal — no join.
  *   - ENCODE ([[encode]]): pure projection (argmin per subspace over the
  *     codebook literal) — no shuffle, runs at scan speed next to the
  *     parquet write that persists the codes.
  *   - SEARCH ([[searchAdc]]): the query's m×ksub distance table is
  *     computed once driver-side (it is index metadata, not data), shipped
  *     as a literal, and the scan sums m array lookups per row — one
  *     columnar pass + TakeOrderedAndProject. No shuffle.
  *
  * Distances are squared L2 (the PQ-native metric; for cosine, L2 over
  * pre-normalized vectors ranks identically).
  */
object ProductQuant {

  /** codebook(sub)(code) = the dsub-dim centroid. */
  final case class PqCodebook(m: Int, ksub: Int, dsub: Int,
      codebook: Array[Array[Array[Double]]])

  /** Σ (a−b)² over two equal-length array columns. r6: the native
    * [[graft.functions.VecOps.vec_l2sq]] kernel (same ascending fold →
    * bit-identical; pinned by VecOpsSpec) — the composed
    * `aggregate(zip_with(...))` form allocated a diff array per evaluation,
    * and [[argminCode]] evaluates this ksub=256 times per row per subspace.
    */
  private def l2sq(a: Column, b: Column): Column =
    graft.functions.VecOps.vec_l2sq(a, b)

  private def sliceOf(v: Column, sub: Int, dsub: Int): Column =
    slice(v, sub * dsub + 1, dsub)

  /** All m argmin-by-L2 codes of a vector in ONE kernel call
    * ([[graft.functions.CentroidOps.pq_encode]]): ties to the lowest code,
    * first strict minimum wins per subspace — bit-identical to the former
    * per-subspace `aggregate(array(struct(lit...)))` composition
    * (CentroidOpsSpec), which re-embedded the whole m×ksub×dsub codebook
    * as plan literals per projection and was re-analyzed + re-codegen'd by
    * the driver on every Lloyd iteration (guide §1.2 step 2).
    */
  private def codesOf(v: Column, cb: PqCodebook): Column =
    graft.functions.CentroidOps.pq_encode(v, cb.codebook, cb.dsub)

  /** Train a PQ codebook: deterministic init (subvectors of the first
    * `ksub` rows by id), `iters` Lloyd steps over ALL subspaces in one job
    * each.
    */
  def train(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 3): PqCodebook = {
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // r6: dim comes from the seed rows already being collected — the
    // separate `select(size(v)).head()` was one more driver job per train
    val seed = vecs.orderBy("id").limit(ksub).as[(Long, Array[Double])]
      .collect().map(_._2)
    require(seed.nonEmpty, "train needs at least one vector")
    val dim = seed.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m

    var cb: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => seed.map(v => v.slice(j * dsub, (j + 1) * dsub)))

    val subMean = udaf(new SimilaritySearch.VecMeanAgg(dsub))
    (0 until math.max(iters, 1)).foreach { _ =>
      // one job: explode to (sub, slice, code) — the Generate is map-side;
      // the aggregate partials combine before the m·ksub-key exchange.
      // r6: assignment = ONE pq_encode kernel call per row (codebook ships
      // as a snapshot reference object, so the generated code is identical
      // across iterations and the codegen cache hits) instead of m
      // argmin-literal folds re-planned per iteration.
      val cbSnap = cb.map(_.clone())
      val codes = graft.functions.CentroidOps.pq_encode(col("v"), cbSnap, dsub)
      val sliced = vecs.select(posexplode(
        array((0 until m).map { j =>
          struct(sliceOf(col("v"), j, dsub).as("sv"),
            element_at(codes, j + 1).as("code"))
        }: _*)).as(Seq("sub", "e")))
        .select(col("sub"), col("e.code").as("code"), col("e.sv").as("sv"))
      val updated = sliced.groupBy(col("sub"), col("code"))
        .agg(subMean(col("sv")).as("c"))
        .as[(Int, Int, Array[Double])].collect()
      updated.foreach { case (sub, code, c) => cb(sub)(code) = c }
    }
    PqCodebook(m, ksub, dsub, cb)
  }

  /** Encode every vector to its m codes — a pure projection. `keep` names
    * extra columns to carry through (e.g. the IVF cell id).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook, keep: Seq[String] = Nil): DataFrame =
    df.select(col(idCol).cast("long").as("id") +:
      keep.map(col) :+
      codesOf(col(vecCol).cast("array<double>"), cb).as("codes"): _*)

  /** The query's asymmetric distance table, flat: dt(j·ksub + code) =
    * ‖q_j − centroid(j)(code)‖². Driver-side — it is m×ksub doubles of
    * index metadata.
    */
  def distanceTable(cb: PqCodebook, query: Array[Double]): Array[Double] = {
    require(query.length == cb.m * cb.dsub)
    val dt = new Array[Double](cb.m * cb.ksub)
    var j = 0
    while (j < cb.m) {
      var c = 0
      while (c < cb.ksub) {
        var d = 0.0
        var i = 0
        while (i < cb.dsub) {
          val diff = query(j * cb.dsub + i) - cb.codebook(j)(c)(i)
          d += diff * diff
          i += 1
        }
        dt(j * cb.ksub + c) = d
        c += 1
      }
      j += 1
    }
    dt
  }

  /** ADC top-k: approx dist(row) = Σⱼ dt(j·ksub + codesⱼ), one scan of the
    * codes table + TakeOrderedAndProject. Ties break on id ascending.
    */
  def searchAdc(codes: DataFrame, cb: PqCodebook, query: Array[Double],
      k: Int): DataFrame = {
    val dt = lit(distanceTable(cb, query))
    val approx = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(cb.m - 1)),
        (c, j) => element_at(dt, (j * cb.ksub + c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
    codes.select(col("id"), round(approx, 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(k)
  }

  /** ADC shortlist + exact re-rank (the IVFADC+R move, Jégou et al. §V):
    * take the `shortlist` nearest rows by ADC over codes alone, then
    * compute EXACT squared L2 on just those rows and keep the top `k`.
    * This is the production recall lever: code-space distances quantize
    * away true-neighbor margins on near-uniform data, but the true top-k
    * almost always survives into a few-× shortlist, and the exact pass
    * touches only `shortlist` full vectors — the scan still reads 8-byte
    * codes, never the raw embedding column.
    *
    * Plan shape: the shortlist (k'·16 bytes) broadcast-joins back to the
    * vector table — one hash-join probe per scanned row, no shuffle of the
    * big side, then a k-row TakeOrderedAndProject.
    */
  def searchAdcRerank(codes: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, cb: PqCodebook, query: Array[Double], k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cand = searchAdc(codes, cb, query, shortlist).select("id")
    vectors.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(cand), "id")
      .select(col("id"), round(l2sq(col("v"), lit(query)), 6).as("l2sq"))
      .orderBy(col("l2sq").asc, col("id").asc)
      .limit(k)
  }
}
