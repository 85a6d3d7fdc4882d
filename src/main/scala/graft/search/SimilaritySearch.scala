package graft.search

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — one scan + a k-row
  *    TakeOrderedAndProject; the correctness baseline and still the right
  *    plan when the query batch is small.
  *  - [[IvfIndex]]: IVF-style coarse quantizer — vectors partitioned into
  *    `nlist` cells by nearest centroid (Lloyd iterations, all DataFrame
  *    ops); a query probes the `nprobe` nearest cells only, cutting the
  *    scanned fraction to ~nprobe/nlist of the table. At 100 TB the cell
  *    assignment is the partition key, so a probe prunes whole files.
  */
object SimilaritySearch {

  /** Exact top-k by cosine against one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val q = lit(query)
    df.select(col(idCol), round(Dedup.cosine(col(vecCol).cast("array<double>"), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  final case class IvfIndex(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Aggregation buffer: elementwise vector sum + row count per group. */
  final case class VecSum(sum: Array[Double], n: Long)

  /** Array-summing aggregator for the Lloyd centroid update (the BloomAgg
    * pattern): map-side partials hold ONE dim-length buffer per (task ×
    * cell) and the exchange carries ≤ nlist × partitions partial sums — the
    * posexplode alternative shuffles n·dim scalar ROWS per iteration, which
    * at 10^10 × 64 is a 10^12-row exchange for a centroid table that fits
    * in a hand.
    */
  private[search] final class VecMeanAgg(dim: Int)
      extends Aggregator[Array[Double], VecSum, Array[Double]] {
    override def zero: VecSum = VecSum(new Array[Double](dim), 0L)
    override def reduce(b: VecSum, v: Array[Double]): VecSum = {
      var i = 0
      while (i < dim) { b.sum(i) += v(i); i += 1 }
      VecSum(b.sum, b.n + 1)
    }
    override def merge(a: VecSum, b: VecSum): VecSum = {
      var i = 0
      while (i < dim) { a.sum(i) += b.sum(i); i += 1 }
      VecSum(a.sum, a.n + b.n)
    }
    override def finish(b: VecSum): Array[Double] =
      if (b.n == 0L) b.sum else b.sum.map(_ / b.n)
    override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Build an IVF index: deterministic init (first `nlist` distinct vectors
    * by id), `iters` Lloyd steps, final cell assignment.
    */
  def buildIvf(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): IvfIndex = {
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))

    var centroids: Array[(Int, Array[Double])] =
      vecs.orderBy("id").limit(nlist).as[(Long, Array[Double])].collect()
        .zipWithIndex.map { case ((_, v), i) => (i, v) }
    val dim = centroids.headOption.map(_._2.length).getOrElse(0)

    (0 until math.max(iters, 1)).foreach { _ =>
      val newCentroids = lloydStep(vecs, centroids, dim)
        .as[(Int, Array[Double])].collect()
      if (newCentroids.nonEmpty)
        centroids = newCentroids.sortBy(_._1)
    }
    IvfIndex(centroids, assignCells(vecs, centroids).persist())
  }

  /** One Lloyd iteration: assign → per-cell vector mean. Exposed for plan
    * tests: the aggregate must exchange ≤ nlist × partitions partial sums,
    * never explode to n·dim rows.
    */
  private[search] def lloydStep(vecs: DataFrame,
      centroids: Array[(Int, Array[Double])], dim: Int): DataFrame = {
    val vecMean = udaf(new VecMeanAgg(dim))
    assignCells(vecs, centroids)
      .groupBy("cell").agg(vecMean(col("v")).as("c"))
  }

  /** Nearest-centroid assignment as a single per-row argmax expression —
    * NO join, NO shuffle (the round-1 design was a broadcast cross-join to
    * n·nlist rows plus a per-id window sort, an avoidable n·nlist
    * exchange). Ties break toward the lowest cell id (strict > keeps the
    * first maximum; the centroid table is cell-ordered).
    *
    * r6 (guide §1.2 step 2): the argmax is the native
    * [[graft.functions.CentroidOps]] kernel — the previous
    * `aggregate(array(struct(lit...)))` composition re-embedded every
    * centroid as plan literals (re-analyzed + re-codegen'd on the driver
    * each Lloyd iteration, since the literals change per round) and walked
    * HOF plumbing per row. Same scan order, same [[Dedup.cosine]]
    * arithmetic, same tie/NaN semantics — bit-identical cells
    * (CentroidOpsSpec).
    */
  private def assignCells(vecs: DataFrame,
      centroids: Array[(Int, Array[Double])]): DataFrame =
    vecs.select(col("id"), col("v"),
      graft.functions.CentroidOps.nearest_cell_cos(col("v"), centroids).as("cell"))

  // ---- Hamming-space k-NN over 64-bit perceptual hashes -------------------

  /** One k-NN candidate: Hamming distance + item id. Ordering is (dist, id)
    * ascending — the id tiebreak keeps results deterministic, which the
    * DuckDB oracle replays exactly.
    */
  final case class Neighbor(dist: Int, id: Long)

  /** Bounded top-k aggregator (smallest `k` by (dist, id)): the buffer is a
    * sorted ≤k-element list, so partial aggregation keeps map-side state at
    * O(k) per (task × query) and the exchange carries ≤ |Q|·k·partitions
    * rows — a per-query window `row_number` instead shuffles ALL n·|Q|
    * scored rows into |Q| reducers, the classic skew at crawl scale.
    */
  private final class TopKAgg(k: Int)
      extends Aggregator[Neighbor, Seq[Neighbor], Seq[Neighbor]] {
    private def lt(a: Neighbor, b: Neighbor): Boolean =
      a.dist < b.dist || (a.dist == b.dist && a.id < b.id)
    override def zero: Seq[Neighbor] = Vector.empty
    override def reduce(b: Seq[Neighbor], n: Neighbor): Seq[Neighbor] =
      if (b.length >= k && !lt(n, b.last)) b
      else {
        val i = b.indexWhere(x => lt(n, x))
        val ins = if (i < 0) b :+ n else (b.take(i) :+ n) ++ b.drop(i)
        if (ins.length > k) ins.take(k) else ins
      }
    override def merge(a: Seq[Neighbor], b: Seq[Neighbor]): Seq[Neighbor] =
      b.foldLeft(a)(reduce)
    override def finish(b: Seq[Neighbor]): Seq[Neighbor] = b
    override def bufferEncoder: Encoder[Seq[Neighbor]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Neighbor]]()
    override def outputEncoder: Encoder[Seq[Neighbor]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Neighbor]]()
  }

  /** Exact k-nearest-neighbors in Hamming space over a 64-bit hash column —
    * the image-payload analog of [[bruteForceTopK]]: `hashes` is
    * `(id long, hash long)` (e.g. [[graft.multimodal.Multimodal.phashAll]]
    * output), `queries` is `(qid int, hash long)`, and the result is the k
    * closest items per query by `bit_count(hash XOR query)` with (dist, id)
    * tie-break: `(qid, rank 1..k, neighbor_id, dist)`.
    *
    * Plan shape: the query batch is tiny so it broadcasts onto one scan of
    * the hash table (no shuffle of the big side), and the per-query top-k
    * runs through [[TopKAgg]] — map-side partials keep O(k) state per query
    * and the single exchange carries ≤ |Q|·k·partitions candidate rows, so
    * the whole thing survives a 10^10-image hash table: one columnar scan
    * of 8-byte hashes + an O(|Q|·k) aggregate. `phashNearDups` answers
    * "all pairs within radius r"; this answers "the k most similar images
    * to THIS one" — reverse-image search over the crawl's perceptual index.
    */
  def hammingKnn(spark: SparkSession, hashes: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    val scored = hashes.select(col("id"), col("hash"))
      .crossJoin(broadcast(queries.select(col("qid"), col("hash").as("qh"))))
      .select(col("qid"),
        bit_count(col("hash").bitwiseXOR(col("qh"))).cast("int").as("dist"),
        col("id"))
    scored.groupBy(col("qid"))
      .agg(topk(col("dist"), col("id")).as("nn"))
      .select(col("qid"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), col("n.dist").as("dist"))
  }

  /** Probe: exact cosine top-k within the `nprobe` nearest cells. */
  def searchIvf(index: IvfIndex, query: Array[Double], k: Int, nprobe: Int): DataFrame = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val cells = index.centroids.sortBy(c => -cos(c._2, query)).take(nprobe).map(_._1)
    index.assigned
      .filter(col("cell").isin(cells.map(c => c: Any): _*))
      .select(col("id"), round(Dedup.cosine(col("v"), lit(query)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
