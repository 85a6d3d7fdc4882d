package graft.crawl

import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.{BloomSketch, Scheduler, SeenSet}
import graft.functions.GraftExpressions._
import graft.tables.SnapshotTable
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed crawl loop — the Spark restatement of blockspider's
  * poll-round state machine (SURVEY.md §3.1):
  *
  *   batch bound → parallel fetch (wide stage) → ordered commit (sort, not
  *   task chain) → revision diff (reorg analog) → envelope emit → atomic
  *   checkpoint.
  *
  * One round = one micro-batch. All state lives in a [[SnapshotTable]]
  * (queue / seen / window / hostctr); every round ends with an atomic
  * snapshot commit, and the next round reads back from the snapshot — which
  * both truncates the iterative lineage and makes any round a resume point
  * (kill the process between rounds: `run` continues from LATEST, the
  * reference's checkpoint-resume semantics, /root/reference/state/state.go).
  *
  * Sink semantics are at-least-once exactly like the reference (emit before
  * checkpoint save, SURVEY.md §2.9): envelopes for round r are written
  * before snapshot r commits, so a crash between the two re-emits round r on
  * resume. Emits are keyed (round, host, ord) → idempotent read-back.
  *
  * Scale notes (the point of the exercise):
  *  - fetch is the only executor-heavy stage; it runs data-parallel over the
  *    scheduled set with NO ordering requirement — order is re-imposed at
  *    commit via per-host rank, the way a shuffle sort replaces the
  *    reference's serial handler (/root/reference/syncronizer/synchronizer.go:14-36);
  *  - per-host top-k scheduling is salted two-phase (see [[Scheduler]]);
  *  - seen-set dedup is bloom-pre-filtered anti-join ([[SeenSet]]), switching
  *    on once the seen table passes `bloomThreshold` rows;
  *  - hostState is broadcast (one row per host);
  *  - revision handling is a bounded K-deep window diff, not an iterative
  *    walk (SURVEY.md §3.2) — metadata about the ≤ few revised hosts is the
  *    only thing ever collected to the driver.
  */
object CrawlJob {

  final case class SchedRow(host: String, url: String, url_hash: Long,
      path: String, seq: Long, priority: Int, host_rank: Int)
  final case class FetchedRow(host: String, url: String, url_hash: Long,
      seq: Long, priority: Int, host_rank: Int, ok: Boolean,
      image_id: String, outlinks: Seq[String], ver: Long)
  final case class WindowRow(host: String, ord: Long, seq: Long,
      url_hash: Long, url: String, ver: Long)

  val EmitCols = Seq("round", "status", "host", "seq", "ord", "url_hash", "url", "priority")

  /** Run (or resume) the crawl for `cfg.rounds` rounds against the synthetic
    * web, checkpointing into `stateDir` and appending emits/pages under
    * `sinkDir`. Returns the round it stopped after.
    */
  def run(spark: SparkSession, cfg: WebConfig, stateDir: String, sinkDir: String,
      upToRound: Option[Long] = None, bloomThreshold: Long = 200000L,
      maxBloomBroadcastBytes: Long = 64L << 20): Long = {
    import spark.implicits._
    val state = new SnapshotTable(stateDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sinkDir))

    val startRound: Long = state.latestSnapshot match {
      case Some(snap) =>
        state.read(spark, "meta").select(max("round")).as[Long].head() + 1
      case None =>
        seedState(spark, cfg, state)
        1L
    }
    val endRound = math.min(upToRound.getOrElse(cfg.rounds.toLong), cfg.rounds.toLong)

    val hostState = spark.createDataset(SyntheticWeb.hostStates(cfg)).toDF()

    var round = startRound
    while (round <= endRound) {
      runRound(spark, cfg, round, state, sinkDir, hostState,
        bloomThreshold, maxBloomBroadcastBytes)
      round += 1
    }
    endRound
  }

  /** Cold start: seed queue from the seed list (T9 analog). Per-host seq is
    * assigned in seed-index order — part of the pinned ordering spec.
    */
  private def seedState(spark: SparkSession, cfg: WebConfig, state: SnapshotTable): Unit = {
    import spark.implicits._
    // F2 empty-response guard: the reference aborts at startup when its
    // start block comes back empty ("block not found",
    // /root/reference/cmd/blockspiderd/main.go:110-115) — a crawl with no
    // resolvable seeds must fail fast, not commit an empty checkpoint.
    val rawSeeds = SyntheticWeb.seedUrls(cfg)
    require(rawSeeds.nonEmpty, "cold start with no seeds (F2 guard: nothing to crawl)")
    val seeds = rawSeeds.zipWithIndex.toDF("raw_url", "seed_idx")
    val canon = seeds
      .withColumn("url", canonicalize_url(col("raw_url")))
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", url_host(col("url")))
      .withColumn("path", url_path(col("url")))
      .withColumn("priority", pmod(xxhash64(col("url")), lit(10)).cast("int"))
    val queue = canon
      .withColumn("seq",
        row_number().over(Window.partitionBy(col("host")).orderBy(col("seed_idx"))).cast("long"))
      .select("host", "url", "url_hash", "path", "seq", "priority")
    val hostctr = queue.groupBy("host")
      .agg((max("seq") + 1).as("next_seq"), lit(1L).as("next_ord"))
    val empty = spark.emptyDataset[(String, Long, Long, Long, String, Long)]
      .toDF("host", "ord", "seq", "url_hash", "url", "ver")
    val emptySeen = spark.emptyDataset[(Long, Long)].toDF("url_hash", "r")
    state.commit(
      Map(
        "queue" -> queue,
        "window" -> empty,
        "hostctr" -> hostctr,
        "blooms" -> SeenSet.emptyBlooms(spark, InitialBloomCapPerShard),
        "meta" -> Seq((0L, 0L, InitialBloomCapPerShard)).toDF("round", "seen_count", "bloom_cap")),
      appendOnly = Map("seen_add" -> emptySeen, "seen_del" -> emptySeen))
  }

  /** Initial bloom sizing (items per shard); compaction resizes with 2×
    * headroom once the alive count outgrows it, so fpp stays bounded forever.
    */
  val InitialBloomCapPerShard = 4096L

  /** The alive seen-set at the latest snapshot: adds minus later tombstones.
    * `seen_add`/`seen_del` are APPEND-ONLY (url_hash, round) event segments —
    * each round writes O(delta), never rewriting the 10^10-row history; a
    * tombstone (revision retraction) kills only adds at or before its round,
    * so a later re-fetch of the same URL resurrects it. Tombstones are rare
    * (bounded by revisions·K), hence the broadcast join: membership is
    * resolved map-side with no shuffle over the big table.
    */
  def readSeen(spark: SparkSession, state: SnapshotTable): DataFrame = {
    val adds = state.read(spark, "seen_add")
    val dels = state.read(spark, "seen_del")
      .groupBy("url_hash").agg(max("r").as("dr"))
    adds.join(broadcast(dels), Seq("url_hash"), "left")
      .filter(col("dr").isNull || col("r") > col("dr"))
      .select("url_hash")
  }

  def readSeen(spark: SparkSession, stateDir: String): DataFrame =
    readSeen(spark, new SnapshotTable(stateDir))

  /** Compact the seen event log every this many rounds: rewrite the alive
    * set as a single segment and clear tombstones.
    */
  val SeenCompactionInterval = 8L

  private def runRound(spark: SparkSession, cfg: WebConfig, round: Long,
      state: SnapshotTable, sinkDir: String, hostState: DataFrame,
      bloomThreshold: Long, maxBloomBroadcastBytes: Long): Unit = {
    import spark.implicits._

    var queue = state.read(spark, "queue")
    val seenBase = readSeen(spark, state)
    // incremental seen-set bookkeeping carried in meta — never recounted by
    // scanning the (10^10-row at target scale) seen table
    val (seenCount0, bloomCap) = state.read(spark, "meta")
      .select(col("seen_count"), col("bloom_cap")).as[(Long, Long)].head()
    var window = state.read(spark, "window")
    var hostctr = state.read(spark, "hostctr")
    val emitParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // this round's seen-set deltas (appended at commit, O(delta) forever)
    val addParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val delParts = scala.collection.mutable.ArrayBuffer[DataFrame]()

    // ---- 1. DATA-DRIVEN revision detection (reorg analog) ----------------
    // The reference never receives reorg notifications: it detects one when
    // fetched data contradicts its window head (cache.Peak().Hash !=
    // block.ParentHash, /root/reference/crawler/blocks.go:276-288) and only
    // then walks the bounded window. The analog here: re-read each window
    // entry's current page version (a K-bounded per-host probe, distributed
    // exactly like the fetch stage) and compare to the version recorded at
    // fetch time. Neither this job nor the oracle walker is told which hosts
    // revised — both observe it.
    {
      val probed = window
        .select("host", "ord", "seq", "url_hash", "url", "ver").as[WindowRow]
        .mapPartitions(_.map(w =>
          (w.host, w.ord, w.seq, w.url_hash, w.url, w.ver,
            SyntheticWeb.pageVersion(cfg, w.url, round))))
        .toDF("host", "ord", "seq", "url_hash", "url", "ver", "cur_ver")
      val dropped = probed.filter(col("cur_ver") > col("ver")).persist()

      // revision metadata is O(#revised hosts) — the only driver collect
      val revHosts = dropped.select("host").distinct().as[String].collect().sorted
      if (revHosts.nonEmpty) {
        emitParts += dropped.select(
          lit(round).as("round"), lit("DROPPED").as("status"), col("host"),
          col("seq"), col("ord"), col("url_hash"), col("url"),
          pmod(xxhash64(col("url")), lit(10)).cast("int").as("priority"))
        window = window.join(dropped.select("host", "ord"), Seq("host", "ord"), "left_anti")
        delParts += dropped.select(col("url_hash"), lit(round).as("r"))

        val ctrs = hostctr.filter(col("host").isin(revHosts.toSeq: _*))
          .select("host", "next_seq", "next_ord").as[(String, Long, Long)]
          .collect().map(r => r._1 -> (r._2, r._3)).toMap

        // replacements: the pages the revised hosts serve NOW (observable
        // data, the sidechain analog) — fetched only because a mismatch was
        // detected, never because a script said so
        val repl = revHosts.toSeq.flatMap { host =>
          val (seq0, ord0) = ctrs(host)
          SyntheticWeb.replacementsFor(cfg, host, round).zipWithIndex.map {
            case (raw, i) =>
              val url = graft.functions.UrlCodec.canonicalize(raw)
              (host, seq0 + i, ord0 + i, graft.functions.GraftHash.xxhash64(url),
                url, SyntheticWeb.pageVersion(cfg, url, round))
          }
        }
        val replDf = repl.toDF("host", "seq", "ord", "url_hash", "url", "ver")
        emitParts += replDf.select(
          lit(round).as("round"), lit("ACCEPTED").as("status"), col("host"),
          col("seq"), col("ord"), col("url_hash"), col("url"),
          pmod(xxhash64(col("url")), lit(10)).cast("int").as("priority"))
        window = window.unionByName(
          replDf.select("host", "ord", "seq", "url_hash", "url", "ver"))
        addParts += replDf.select(col("url_hash"), lit(round).as("r"))

        val ctrDelta = repl.groupBy(_._1).map { case (h, rows) =>
          (h, rows.size.toLong, rows.size.toLong)
        }.toSeq.toDF("host", "dseq", "dord")
        hostctr = hostctr.join(broadcast(ctrDelta), Seq("host"), "left")
          .withColumn("next_seq", col("next_seq") + coalesce(col("dseq"), lit(0L)))
          .withColumn("next_ord", col("next_ord") + coalesce(col("dord"), lit(0L)))
          .drop("dseq", "dord")
      }
      dropped.unpersist()
    }

    // ---- 2. robots gate: permanent discard (never fetched, never seen) ---
    val gatedOut = queue.join(broadcast(hostState), Seq("host"))
      .filter(Scheduler.robotsDisallowed(col("path"), col("robots_disallow")))
      .select(queue.columns.map(col): _*)
    queue = queue.join(gatedOut.select("url_hash"), Seq("url_hash"), "left_anti")

    // ---- 3. politeness-aware per-host top-k ------------------------------
    val scheduled = Scheduler.schedule(queue, hostState, cfg.roundMillis)
      .select("host", "url", "url_hash", "path", "seq", "priority", "host_rank")
      .as[SchedRow]

    // ---- 4. parallel fetch (the wide stage; order NOT required here) -----
    val fetched: Dataset[FetchedRow] = scheduled.mapPartitions { it =>
      it.map { s =>
        val ok = !SyntheticWeb.failsAt(cfg, s.url, round)
        FetchedRow(s.host, s.url, s.url_hash, s.seq, s.priority, s.host_rank, ok,
          if (ok) SyntheticWeb.imageIdOf(s.url, cfg.numImages) else null,
          if (ok) SyntheticWeb.outlinksOf(cfg, s.url) else Seq.empty,
          // record the page version seen at fetch time: the revision
          // detector compares future re-reads against this
          SyntheticWeb.pageVersion(cfg, s.url, round))
      }
    }

    // ---- 5. prefix commit: drop everything at/after a host's first failure
    val fetchedDf = fetched.toDF().persist()
    val minFailed = fetchedDf.filter(!col("ok"))
      .groupBy("host").agg(min("host_rank").as("min_failed"))
    val committed = fetchedDf
      .join(broadcast(minFailed), Seq("host"), "left")
      .filter(col("min_failed").isNull || col("host_rank") < col("min_failed"))
      .drop("min_failed")
      .persist()

    // ---- 6. ordered commit: ord = next_ord + host_rank - 1 ---------------
    val withOrd = committed
      .join(hostctr.select("host", "next_ord"), Seq("host"), "left")
      .withColumn("ord", coalesce(col("next_ord"), lit(1L)) + col("host_rank") - 1)
      .drop("next_ord")
      .persist()

    emitParts += withOrd.select(
      lit(round).as("round"), lit("ACCEPTED").as("status"), col("host"),
      col("seq"), col("ord"), col("url_hash"), col("url"), col("priority"))

    val pages = withOrd.select(lit(round).as("round"), col("host"), col("seq"),
      col("url_hash"), col("image_id"))

    // ---- 7. state updates -------------------------------------------------
    window = window
      .unionByName(withOrd.select("host", "ord", "seq", "url_hash", "url", "ver"))
      .withColumn("w_rank",
        row_number().over(Window.partitionBy(col("host")).orderBy(col("ord").desc)))
      .filter(col("w_rank") <= cfg.windowK)
      .drop("w_rank")
    addParts += withOrd.select(col("url_hash"), lit(round).as("r"))
    queue = queue.join(withOrd.select("url_hash"), Seq("url_hash"), "left_anti")

    // ---- 8. discoveries: canonicalize → hash → dedup → assign seq --------
    val candidatesRaw = withOrd
      .select(explode(col("outlinks")).as("raw_url"))
      .withColumn("url", canonicalize_url(col("raw_url")))
      .withColumn("url_hash", xxhash64(col("url")))
      .dropDuplicates("url_hash")
      .withColumn("host", url_host(col("url")))
      .withColumn("path", url_path(col("url")))
      .withColumn("priority", pmod(xxhash64(col("url")), lit(10)).cast("int"))
      .select("host", "url", "url_hash", "path", "priority")

    // effective seen for discovery dedup = base − this round's tombstones
    // + this round's adds (revision replacements and committed fetches)
    val emptySeenDelta = spark.emptyDataset[(Long, Long)].toDF("url_hash", "r")
    val addsDelta = (addParts :+ emptySeenDelta).reduce(_ unionByName _)
      .localCheckpoint(true) // small (O(delta)); feeds count, bloom delta, and commit
    val delsDelta = (delParts :+ emptySeenDelta).reduce(_ unionByName _)
      .localCheckpoint(true)
    val seen = seenBase
      .join(delsDelta.select("url_hash"), Seq("url_hash"), "left_anti")
      .unionByName(addsDelta.select("url_hash"))

    // O(delta) bookkeeping: every tombstone targets a currently-alive window
    // entry and every add is dedup-guarded, so the alive count is exact
    val addsCount = addsDelta.count()
    val delsCount = delsDelta.count()
    val seenCount = seenCount0 + addsCount - delsCount
    val isCompaction = round % SeenCompactionInterval == 0

    // bloom maintenance, O(delta): OR-merge this round's adds into the
    // persisted shard blobs. Compaction rounds instead REBUILD from the
    // alive set (clears tombstoned bits, resizes with 2× headroom if the
    // population outgrew the blobs) — O(total) but amortized with the seen
    // compaction itself, which rewrites the same rows anyway.
    val newBloomCap =
      if (isCompaction && seenCount > SeenSet.DefaultShards * bloomCap / 2)
        math.max(2L * seenCount / SeenSet.DefaultShards, InitialBloomCapPerShard)
      else bloomCap
    val blooms =
      (if (isCompaction) SeenSet.buildBloomsDf(seen, newBloomCap)
       else if (addsCount == 0) state.read(spark, "blooms")
       else SeenSet.mergeBlooms(state.read(spark, "blooms"),
         SeenSet.bloomDelta(addsDelta, bloomCap)))
        .localCheckpoint(true) // ≤ shards blob rows; used for probe AND commit

    val notSeen =
      if (seenCount >= bloomThreshold) {
        // probe transport: broadcast while the blob set is small; shard-local
        // files once it is not (at 10^10 keys the blobs are ~GBs — they must
        // not ship to every executor)
        val estBytes = SeenSet.DefaultShards * BloomSketch.sizeBytes(newBloomCap, SeenSet.DefaultFpp)
        val provider =
          if (estBytes <= maxBloomBroadcastBytes) SeenSet.broadcastProvider(spark, blooms)
          else SeenSet.writeShardFiles(blooms, f"${state.dir}/bloomblobs/round-$round%06d")
        SeenSet.filterNew(spark, candidatesRaw, seen, provider)
      } else SeenSet.filterNewExact(candidatesRaw, seen)
    val fresh = notSeen
      .join(queue.select("url_hash"), Seq("url_hash"), "left_anti")
      .withColumn("cand_rank",
        row_number().over(Window.partitionBy(col("host")).orderBy(col("url_hash"))).cast("long"))

    val newEntries = fresh
      .join(hostctr.select("host", "next_seq"), Seq("host"), "left")
      .withColumn("seq", coalesce(col("next_seq"), lit(1L)) + col("cand_rank") - 1)
      .select("host", "url", "url_hash", "path", "seq", "priority")
    queue = queue.unionByName(newEntries)

    // ---- 9. host counters --------------------------------------------------
    val dOrd = withOrd.groupBy("host").agg(count(lit(1)).as("d_ord"))
    val dSeq = fresh.groupBy("host").agg(count(lit(1)).as("d_seq"))
    hostctr = hostctr
      .join(dOrd, Seq("host"), "full_outer")
      .join(dSeq, Seq("host"), "full_outer")
      .select(col("host"),
        (coalesce(col("next_seq"), lit(1L)) + coalesce(col("d_seq"), lit(0L))).as("next_seq"),
        (coalesce(col("next_ord"), lit(1L)) + coalesce(col("d_ord"), lit(0L))).as("next_ord"))

    // ---- 10. emit (before checkpoint → at-least-once), then commit -------
    val emits = emitParts.reduce(_ unionByName _)
    emits
      .repartitionByRange(col("host"))
      .sortWithinPartitions(Scheduler.globalOrder: _*)
      .write.mode(SaveMode.Overwrite).parquet(f"$sinkDir/emits-$round%04d")
    pages.write.mode(SaveMode.Overwrite).parquet(f"$sinkDir/pages-$round%04d")

    // per-partition lineage + fetch metrics (north_rule)
    fetchedDf
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_fetched"),
        sum(when(!col("ok"), 1L).otherwise(0L)).as("n_failed"),
        min("seq").as("min_seq"), max("seq").as("max_seq"))
      .withColumn("round", lit(round))
      .write.mode(SaveMode.Overwrite).parquet(f"$sinkDir/metrics-$round%04d")

    val meta = Seq((round, seenCount, newBloomCap)).toDF("round", "seen_count", "bloom_cap")
    if (isCompaction) {
      // compaction: fold the event log into one alive segment, clear
      // tombstones — resume and membership semantics unchanged
      state.commit(Map(
        "queue" -> queue, "window" -> window, "hostctr" -> hostctr,
        "seen_add" -> seen.withColumn("r", lit(round)), // already base−dels+adds
        "seen_del" -> emptySeenDelta,
        "blooms" -> blooms,
        "meta" -> meta))
    } else {
      state.commit(
        Map("queue" -> queue, "window" -> window, "hostctr" -> hostctr,
          "blooms" -> blooms, "meta" -> meta),
        appendOnly = Map("seen_add" -> addsDelta, "seen_del" -> delsDelta))
    }
    state.expireOldSnapshots(keep = 2)
    expireOldBloomBlobs(state.dir, round, keep = 2)

    fetchedDf.unpersist(); committed.unpersist(); withOrd.unpersist()
  }

  /** Drop shard-local bloom blob directories older than `keep` rounds behind
    * the latest (file-mode probe transport only; a no-op otherwise).
    */
  private def expireOldBloomBlobs(stateDir: String, round: Long, keep: Int): Unit = {
    val root = java.nio.file.Paths.get(stateDir, "bloomblobs")
    if (java.nio.file.Files.isDirectory(root)) {
      val s = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("round-"))
          .filter(_.getFileName.toString.stripPrefix("round-").toLong <= round - keep)
          .toSeq.foreach { d =>
            val files = java.nio.file.Files.list(d)
            try files.iterator().asScala.toSeq.foreach(java.nio.file.Files.deleteIfExists)
            finally files.close()
            java.nio.file.Files.deleteIfExists(d)
          }
      } finally s.close()
    }
  }

  /** All emitted envelopes across rounds, in the pinned global order. */
  def readEmits(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(s"$sinkDir/emits-*")

  def readPages(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(s"$sinkDir/pages-*")
}
