package graft.tools
import org.apache.spark.sql.functions._
object DrivePlans {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val d = "/root/testdata/sf0.01"
    def show(name: String): Unit = {
      println(s"######## $name")
      graft.SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    Seq("q_filter_pushdown", "q_join3", "q_broadcast_join", "q_anti_join",
      "q_politeness_topk", "q_token_jaccard", "q_url_canon").foreach(show)
    // frontier schedule plan
    println("######## scheduler")
    import spark.implicits._
    val hostState = spark.createDataset(graft.fixtures.SyntheticWeb.hostStates(graft.fixtures.WebConfig())).toDF()
    val queue = spark.range(1000).select(
      concat(lit("http://host"), (col("id")%16).cast("string"), lit(".test/p/"), col("id").cast("string")).as("url"))
      .select(col("url"), xxhash64(col("url")).as("url_hash"),
        graft.functions.GraftExpressions.url_host(col("url")).as("host"),
        graft.functions.GraftExpressions.url_path(col("url")).as("path"),
        lit(1).as("priority"), col("url_hash").as("seq"))
    graft.frontier.Scheduler.schedule(queue, hostState, 1000L).explain("formatted")

    // frontier queue delta log: alive view = add segments minus small del
    // tombstones — one columnar pass, no shuffle of the big table
    println("######## queue delta-log alive view (CrawlJob.readQueue)")
    val cfg = graft.fixtures.WebConfig(numSeeds = 20, rounds = 2)
    val st = java.nio.file.Files.createTempDirectory("plans-state").toString
    val sk = java.nio.file.Files.createTempDirectory("plans-sink").toString
    graft.crawl.CrawlJob.run(spark, cfg, st, sk)
    graft.crawl.CrawlJob.readQueue(spark, st).explain("formatted")

    // head-cache scheduling input: the per-round scan is the BOUNDED head
    // segments (O(hosts × capacity·depth)), never the queue_add backing log
    println("######## head-cache alive view (CrawlJob.readHead)")
    val stTbl = new graft.tables.SnapshotTable(st)
    graft.crawl.CrawlJob.readHead(spark, stTbl).explain("formatted")
    val headRows = graft.crawl.CrawlJob.readHead(spark, stTbl).count()
    val queueRows = graft.crawl.CrawlJob.readQueue(spark, stTbl).count()
    println(s"HEADSIZE head_alive=$headRows queue_alive=$queueRows " +
      s"(scheduler scans the former; the latter only at the amortized fold)")

    // bloom probe: must sit inside a codegen span, not a UDF
    println("######## bloom probe (SeenSet.filterNew, broadcast provider)")
    val seen = spark.range(100000).select(xxhash64(col("id")).as("url_hash"))
    val blooms = graft.frontier.SeenSet.buildBloomsDf(seen, 4096).localCheckpoint(true)
    val prov = graft.frontier.SeenSet.broadcastProvider(spark, blooms)
    graft.frontier.SeenSet.filterNew(spark, queue, seen, prov).explain("formatted")

    // member-store probe: the maybe-seen remainder resolves via the codegen
    // member_alive binary-search probe — NO scan of any member table in the
    // per-round plan (the store blobs live outside the plan entirely)
    println("######## member fingerprint-store probe (SeenSet.filterNewStore)")
    val msRoot = java.nio.file.Files.createTempDirectory("plans-memstore").toString
    graft.frontier.MemberStore.writeBase(seen, msRoot, 0L,
      graft.frontier.SeenSet.DefaultShards)
    val memProv = graft.frontier.MemberStore.providerAsOf(msRoot, 0L)
    val emptyDelta = spark.range(0).select(col("id").as("url_hash"))
    graft.frontier.SeenSet.filterNewStore(spark, queue, memProv, prov,
      emptyDelta, emptyDelta).explain("formatted")

    // connected-components alternation: the per-round plan is two keyed
    // min-aggregations + two equi-joins + two distincts over narrow
    // (long, long) edges — no window, no cross join, nothing driver-side
    println("######## connected-components alternation (Dedup.ccAlternate)")
    val ccEdges = spark.range(1000).select(
      xxhash64(col("id")).as("a"), xxhash64(col("id") + 1).as("b"))
    graft.dedup.Dedup.ccAlternate(ccEdges).explain("formatted")

    // IVF assignment: no Exchange — per-row argmax over a centroid literal
    println("######## ivf assignment")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val idx = graft.search.SimilaritySearch.buildIvf(spark, emb, "vec_id", "embedding",
      nlist = 8, iters = 1)
    idx.assigned.explain("formatted")
    idx.assigned.unpersist()
    spark.stop()
  }
}
