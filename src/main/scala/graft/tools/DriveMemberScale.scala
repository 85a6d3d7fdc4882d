package graft.tools

import graft.frontier.{MemberStore, SeenSet}
import org.apache.spark.sql.functions._

/** Evidence for the O(delta)-per-round membership-dedup contract (the r4
  * VERDICT residual): the dedup phase must NOT scale with TOTAL members.
  *
  * For each member-set size M: build the exact fingerprint store (base
  * generation) + blooms once (fold-time work, untimed), then run the same
  * dedup round — a fixed candidate batch, half already-members half new,
  * through bloom probe + store probe — several times. Round 1 faults the
  * store blobs into the JVM cache (the once-per-fold cost a real crawl
  * amortizes over the compaction interval); steady-state rounds 2+ probe
  * resident blobs and should be FLAT in M. The old path (anti-join against
  * the parquet member log) is timed alongside at each M for contrast — it
  * re-reads O(M) rows every round by construction.
  *
  *   sbt -batch 'runMain graft.tools.DriveMemberScale 8 1000000,10000000 4'
  */
object DriveMemberScale {
  def main(a: Array[String]): Unit = {
    val cores = a.headOption.map(_.toInt).getOrElse(8)
    val sizes = a.drop(1).headOption.map(_.split(",").map(_.toLong))
      .getOrElse(Array(1000000L, 10000000L))
    val rounds = a.drop(2).headOption.map(_.toInt).getOrElse(4)
    val nCand = 1000000L
    val spark = graft.GraftSession.get(cores)
    spark.sparkContext.setLogLevel("WARN")
    val parts = spark.sparkContext.defaultParallelism
    val emptyDelta = spark.range(0).select(col("id").as("url_hash"))

    sizes.foreach { m =>
      // members = xxhash64(0..M); candidates = half drawn from the member id
      // space, half from far outside it (genuinely new)
      val members = spark.range(0, m, 1, parts)
        .select(xxhash64(col("id")).as("url_hash"))
      val candidates = spark.range(0, nCand, 1, parts)
        .select(xxhash64(when(col("id") % 2 === 0,
            floor(col("id") / 2).cast("long")) // integer halves: TRUE members
          .otherwise(col("id") + 4000000000L)).as("url_hash"))
        .localCheckpoint(true)

      // fold-time setup (untimed): store base + blooms + parquet twin
      val root = java.nio.file.Files.createTempDirectory(s"memscale-$m").toString
      MemberStore.writeBase(members, root, 0L, SeenSet.DefaultShards)
      val cap = math.max(m / SeenSet.DefaultShards, 1024L)
      val blooms = SeenSet.buildBloomsDf(members, cap).localCheckpoint(true)
      val bloomProv = SeenSet.broadcastProvider(spark, blooms)
      val memberProv = MemberStore.providerAsOf(root, 0L)
      val pq = java.nio.file.Files.createTempDirectory(s"memscale-pq-$m").toString
      members.write.mode("overwrite").parquet(pq)
      val membersPq = spark.read.parquet(pq)

      (1 to rounds).foreach { r =>
        val t0 = System.nanoTime()
        val nNew = SeenSet.filterNewStore(spark, candidates, memberProv, bloomProv,
          emptyDelta, emptyDelta).count()
        val storeSecs = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nOld = SeenSet.filterNew(spark, candidates, membersPq, bloomProv).count()
        val joinSecs = (System.nanoTime() - t1) / 1e9
        require(nNew == nOld, s"store/anti-join disagree: $nNew vs $nOld")
        val tag = if (r == 1) "fault-in" else "steady"
        println(f"MEMSCALE members=$m%,d round=$r ($tag%-8s): " +
          f"store=$storeSecs%6.2f s  anti-join=$joinSecs%6.2f s  (new=$nNew)")
      }
    }
    spark.stop()
  }
}
