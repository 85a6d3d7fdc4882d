package graft.search

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val embeddings = spark.read
    .parquet(s"${SparkTestBase.sfDir}/embeddings.parquet").cache()
  lazy val query = (0 until 64).map(i => math.sin(i + 1)).toArray

  test("brute-force top-k is deterministic and ordered") {
    val a = SimilaritySearch.bruteForceTopK(embeddings, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect()
    val b = SimilaritySearch.bruteForceTopK(embeddings, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).toSeq === a.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("IVF recall grows with nprobe and reaches exactness at nprobe=nlist") {
    // embeddings are near-uniform random 64-dim vectors — the worst case for
    // a coarse quantizer — so absolute recall at small nprobe is inherently
    // modest; the contract is monotone recall and exactness at full probe.
    val exact = SimilaritySearch.bruteForceTopK(embeddings, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val idx = SimilaritySearch.buildIvf(spark, embeddings, "vec_id", "embedding",
      nlist = 16, iters = 2)
    def recallAt(nprobe: Int): Double = {
      val got = SimilaritySearch.searchIvf(idx, query, 10, nprobe)
        .as[(Long, Double)].collect().map(_._1).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r4 = recallAt(4); val r8 = recallAt(8); val r16 = recallAt(16)
    assert(r4 > 0.0, "nprobe=4 found nothing")
    assert(r8 >= r4 && r16 >= r8, s"recall not monotone: $r4 / $r8 / $r16")
    assert(r16 === 1.0, "nprobe = nlist must equal brute force")
    idx.assigned.unpersist()
  }

  test("IVF cells partition the table (every vector in exactly one cell)") {
    val idx = SimilaritySearch.buildIvf(spark, embeddings, "vec_id", "embedding",
      nlist = 8, iters = 1)
    assert(idx.assigned.count() === embeddings.count())
    assert(idx.assigned.select("id").distinct().count() === embeddings.count())
    idx.assigned.unpersist()
  }

  test("Lloyd update: array-sum aggregate (no n·dim explode), centroids exact means") {
    val dim = 64
    def v(hot: Int, scale: Double) =
      (0 until dim).map(d => if (d == hot) scale else 0.01 * (d + 1)).toArray
    // ids 0 and 1 seed the two initial centroids; the rest split cleanly
    val rows = Seq(
      (0L, v(0, 5.0)), (1L, v(1, 5.0)),
      (2L, v(0, 4.0)), (3L, v(0, 6.0)),
      (4L, v(1, 4.0)), (5L, v(1, 6.0)))
    val df = rows.toDF("vec_id", "embedding")
    val vecs = df.selectExpr("vec_id as id", "embedding as v")
    val init = rows.take(2).zipWithIndex.map { case ((_, vv), i) => (i, vv) }.toArray
    val step = SimilaritySearch.lloydStep(vecs, init, dim)
    // no Generate (posexplode) anywhere: the update is one hash aggregate
    val plan = step.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"Lloyd update explodes vectors:\n$plan")
    // centroids are the exact componentwise means of their members
    val got = step.as[(Int, Array[Double])].collect().sortBy(_._1)
    val want = Seq(
      0 -> Seq(0L, 2L, 3L), 1 -> Seq(1L, 4L, 5L)).map { case (c, ids) =>
      val vs = ids.map(i => rows(i.toInt)._2)
      c -> (0 until dim).map(d => vs.map(_(d)).sum / vs.size).toArray
    }
    got.zip(want).foreach { case ((gc, gv), (wc, wv)) =>
      assert(gc === wc)
      gv.zip(wv).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    }
  }

  test("IVF assignment plan has no shuffle (per-row argmax, not join+window)") {
    val idx = SimilaritySearch.buildIvf(spark, embeddings, "vec_id", "embedding",
      nlist = 8, iters = 1)
    val plan = idx.assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cell assignment shuffles:\n$plan")
    idx.assigned.unpersist()
  }

  test("hammingKnn ≡ scala brute force with (dist, id) tie-break") {
    import graft.functions.GraftHash.mix64
    val n = 1500
    val hashes = (0L until n).map(i => (i, mix64(i, 21L)))
    val queries = (0 until 6).map(q => (q, mix64(q.toLong * 97L, 21L) ^ (1L << q)))
    val got = SimilaritySearch.hammingKnn(spark,
        hashes.toDF("id", "hash"), queries.toDF("qid", "hash"), 7)
      .as[(Int, Int, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      }
    val want = queries.map { case (q, qh) =>
      q -> hashes.map { case (id, h) =>
        (id, java.lang.Long.bitCount(h ^ qh))
      }.sortBy { case (id, d) => (d, id) }.take(7).toSeq
    }.toMap
    assert(got === want)
    // the base row (dist exactly 1: one flipped bit) is always rank 1
    got.foreach { case (q, rs) => assert(rs.head === ((q.toLong * 97L, 1))) }
  }

  test("hammingKnn exchange carries only bounded top-k partials, not all scored rows") {
    import graft.functions.GraftHash.mix64
    val hashes = (0L until 2000L).map(i => (i, mix64(i, 22L))).toDF("id", "hash")
    val queries = (0 until 4).map(q => (q, mix64(q.toLong, 23L))).toDF("qid", "hash")
    val plan = SimilaritySearch.hammingKnn(spark, hashes, queries, 5)
      .queryExecution.executedPlan.toString
    // the big side must meet the query batch via broadcast (no shuffle of
    // the scan), and the per-query top-k must be an aggregate with map-side
    // partials (HashAggregate/ObjectHashAggregate) — NOT a window sort
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Window"), s"per-query window rank would shuffle all scored rows:\n$plan")
    assert(plan.contains("Aggregate"), plan)
  }
}
