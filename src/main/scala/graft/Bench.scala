package graft

import graft.frontier.{Scheduler, SeenSet}
import graft.functions.GraftExpressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "frontier":{"urls_per_sec_8":...,"urls_per_sec_32":...,
  *              "scaling_efficiency":...}}
  *
  * Two parts:
  *  1. headline analytic queries from SparkEntry on SPARK_GRAFT_SF_DIR;
  *  2. the north_rule scaling evidence: the frontier dataflow
  *     (canonicalize → xxhash64 → bloom+anti-join dedup → robots gate →
  *     salted per-host top-k) run at local[8] and local[32] on identical
  *     input — the sandbox stand-in for N vs 4N executors. Efficiency =
  *     (T_8 / T_32) / 4.
  */
object Bench {

  val HeadlineQueries = Seq(
    "q1_agg", "q_join3", "q_window_topn", "q_sessionize", "q_dedup_exact",
    "q_token_jaccard", "q_minhash_neardups", "q_simhash_neardups",
    "q_ann_bruteforce", "q_embed_refcos", "q_text_stats", "q_url_canon",
    "q_hex_roundtrip", "q_politeness_topk", "q_reorg_diff")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // part 1: headline queries
    val spark = GraftSession.get(cpus)
    val results = HeadlineQueries.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (jit + parquet footer cache)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // part 2: frontier throughput at two parallelism levels
    val n = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "2000000").toLong
    val t8 = frontierSecs(8, n)
    val t32 = frontierSecs(32, n)
    val eff = (t8 / t32) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + t8 + t32
    val frontier = f"""{"n_urls":$n,"urls_per_sec_8":${n / t8}%.0f,""" +
      f""""urls_per_sec_32":${n / t32}%.0f,"secs_8":$t8%.2f,"secs_32":$t32%.2f,""" +
      f""""scaling_efficiency":$eff%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""frontier":$frontier,"sf":"$sfDir"}""")
  }

  /** One frontier scheduling round over `n` synthetic URLs (half already
    * seen), timed after a warm-up pass. Fresh SparkSession per parallelism
    * level so the executor-thread count really differs.
    */
  def frontierSecs(cores: Int, n: Long): Double = {
    val spark = GraftSession.builder(cores)
      .appName(s"graft-frontier-$cores").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      run(spark, n / 10) // warm-up: jit + codegen
      val t0 = System.nanoTime()
      run(spark, n)
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }

  private def run(spark: SparkSession, n: Long): Unit = {
    val parts = spark.sparkContext.defaultParallelism
    val hosts = 256

    val frontier = spark.range(0, n, 1, parts)
      .select(concat(lit("HTTP://Host"), pmod(col("id"), lit(hosts)).cast("string"),
        lit(".Example.COM:80/p/./x/../"), col("id").cast("string"),
        lit("#f")).as("raw_url"))
      .select(canonicalize_url(col("raw_url")).as("url"))
      .select(col("url"), xxhash64(col("url")).as("url_hash"),
        url_host(col("url")).as("host"), url_path(col("url")).as("path"),
        pmod(xxhash64(col("url")), lit(10)).cast("int").as("priority"),
        (xxhash64(col("url")) % 100000).as("seq"))

    // seen set: every third URL (pre-hashed table, as the checkpoint would be)
    val seen = frontier.filter(col("seq") % 3 === 0).select("url_hash")

    val blooms = SeenSet.buildBlooms(seen, expectedItemsPerShard =
      math.max(n / SeenSet.DefaultShards, 1024L))
    val fresh = SeenSet.filterNew(spark, frontier, seen, blooms)

    val hostState = spark.range(hosts)
      .select(concat(lit("host"), col("id").cast("string"), lit(".example.com")).as("host"),
        array(lit("/private/")).as("robots_disallow"),
        (lit(1L) + col("id") % 5).as("min_delay_ms"),
        (lit(1000) + col("id").cast("int") % 100).as("budget"))

    Scheduler.schedule(fresh, hostState, roundMillis = 10000L).count(): Unit
  }
}
