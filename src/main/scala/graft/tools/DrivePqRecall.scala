package graft.tools

import graft.search.{IvfPq, ProductQuant}
import org.apache.spark.sql.functions._

/** Measures q_ann_pq's ADC recall@10 vs exact squared-L2 on the driver
  * embeddings tables, across (m, ksub) configs — the evidence behind
  * AnnPqRecallFloor.
  *
  *   sbt -batch 'runMain graft.tools.DrivePqRecall'
  */
object DrivePqRecall {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    spark.sparkContext.setLogLevel("WARN")
    val q = (0 until 64).map(i => math.sin(i + 1)).toArray
    val qLit = lit(q)

    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = emb.select(col("vec_id").as("id"),
          aggregate(zip_with(col("embedding").cast("array<double>"), qLit,
            (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x).as("d"))
        .orderBy(col("d").asc, col("id").asc).limit(10)
        .select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet
      for ((m, ksub) <- Seq((8, 32), (16, 16), (16, 32), (8, 64))) {
        val cb = ProductQuant.train(spark, emb, "vec_id", "embedding", m, ksub, iters = 3)
        val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
        val approx = ProductQuant.searchAdc(codes, cb, q, 10)
          .select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet
        val recall = (exact intersect approx).size / 10.0
        val reranked = ProductQuant.searchAdcRerank(codes, emb, "vec_id",
            "embedding", cb, q, k = 10, shortlist = 50)
          .select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet
        val rr = (exact intersect reranked).size / 10.0
        println(f"PQRECALL $sf m=$m%2d ksub=$ksub%2d recall@10=$recall%.2f " +
          f"rerank50@10=$rr%.2f")
      }
      // IVFADC: probe-pruned scan + residual-PQ ADC + exact re-rank
      val idx = IvfPq.build(spark, emb, "vec_id", "embedding",
        nlist = 16, m = 16, ksub = 32, iters = 3)
      for (nprobe <- Seq(4, 8, 16)) {
        val got = IvfPq.search(idx, emb, "vec_id", "embedding", q,
            k = 10, nprobe = nprobe, shortlist = 50)
          .select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet
        val rc = (exact intersect got).size / 10.0
        println(f"IVFPQRECALL $sf nlist=16 m=16 ksub=32 nprobe=$nprobe%2d " +
          f"rerank50@10=$rc%.2f")
      }
    }
    spark.stop()
  }
}
