package graft

import graft.frontier.{Scheduler, SeenSet}
import graft.functions.GraftExpressions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "frontier":{"urls_per_sec_lo":...,"urls_per_sec_hi":...,
  *              "scaling_efficiency":...}}
  *
  * Two parts:
  *  1. headline analytic queries from SparkEntry on SPARK_GRAFT_SF_DIR;
  *  2. the north_rule scaling evidence: one frontier ROUND (probe the
  *     persisted seen-blooms → anti-join dedup → robots gate → salted
  *     per-host top-k → fetch+decode+PSNR-validate → O(delta) bloom
  *     maintenance) run at two parallelism levels on identical input — the
  *     sandbox stand-in for N vs 4N executors. Efficiency =
  *     (T_lo / T_hi) / (cores_hi / cores_lo).
  *
  * The seen-set blooms are built in SETUP, not in the timed region: they are
  * checkpoint state carried between rounds (built once, OR-merged per round),
  * so a round's cost includes the probe and the delta merge but NOT a rebuild
  * from the full seen table — matching what [[graft.crawl.CrawlJob]] actually
  * does since the incremental-bloom commit.
  */
object Bench {

  val HeadlineQueries = Seq(
    "q1_agg", "q_join3", "q_window_topn", "q_sessionize", "q_dedup_exact",
    "q_token_jaccard", "q_minhash_neardups", "q_simhash_neardups",
    "q_ann_bruteforce", "q_embed_refcos", "q_text_stats", "q_url_canon",
    "q_hex_roundtrip", "q_politeness_topk", "q_reorg_diff")

  def main(args: Array[String]): Unit = {
    // child mode: `Bench frontier <cores> <n>` — one isolated measurement
    if (args.length >= 3 && args(0) == "frontier") {
      val t = frontierSecs(args(1).toInt, args(2).toLong)
      println(f"FRONTIER_SECS=$t%.4f")
      sys.exit(0)
    }
    // child mode: `Bench frontierlevel <cores> <n> <reps>` — one JVM for a
    // LEVEL VISIT: setup once, one discarded full warm run, then `reps`
    // timed runs, ALL rep times reported (the parent picks the statistic)
    if (args.length >= 4 && args(0) == "frontierlevel") {
      val ts = frontierLevelRuns(args(1).toInt, args(2).toLong, args(3).toInt)
      println("FRONTIER_RUNS=" + ts.map(t => f"$t%.4f").mkString(","))
      sys.exit(0)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // part 1 (RUN SECOND, see below): headline analytic queries.
    // part 2 (RUN FIRST): frontier throughput at two parallelism levels.
    //
    // The frontier levels run BEFORE the headline queries: the headline
    // phase inflates this parent JVM's heap with a 32-thread sf-load whose
    // pages stay resident after spark.stop(), and the r2/r3 driver
    // artifacts (efficiency 0.803/0.805) ran the frontier second under
    // exactly that memory pressure while standalone runs of the identical
    // per-level layout measured 0.93-1.01. Frontier-first measures the
    // levels against a parent that has allocated nothing yet.
    //
    // Each level visit runs in its OWN child JVM: reusing one JVM across
    // levels contaminates the second measurement (heap residue skews it
    // 5-8x, observed both directions), and separate processes are also the
    // honest analog of separate cluster sizes.
    // N vs 4N parallelism on identical input. local[2] vs local[8] rather
    // than 8 vs 32: this single box saturates its memory bandwidth well
    // before 32 threads (measured: 32 threads burn ~1.5-2x the CPU of 8 for
    // the same work), which a real 4x-bigger cluster — whose bandwidth
    // scales with nodes — would not. 2→8 keeps the comparison about the
    // ENGINE's scaling, not the host's bus.
    //
    // SYMMETRIC SAMPLING (r3 ADVICE): both levels get the SAME number of
    // timed reps and the SAME estimator — the per-level MINIMUM over the
    // equal-count pool. The r3 layout gave the hi level 2x the reps and
    // compared per-level minima; min over more samples is biased low, which
    // inflated the gated ratio in its own favor — with EQUAL counts the
    // estimator is comparable across levels by construction (the ADVICE
    // remedy). Min rather than median because this host's noise is
    // additive positive stalls (page-reclaim/GC events of ~5-15 s): in the
    // same sample pool a stall inflates a 43 s hi median by ~9% but a
    // 137 s lo median by only ~3%, biasing the RATIO down, while each
    // level's min estimates its stall-free capability symmetrically. The
    // median and the full rep arrays are reported alongside for scrutiny.
    // Drift-robustness comes from INTERLEAVING: the levels alternate
    // (lo,hi,lo,hi,...) across `jvms` visits each, so both levels sample
    // the same span of host time; each visit's one discarded full-n warm
    // run absorbs the preceding JVM's page-reclaim penalty before any
    // timing starts (the r2 measurements that damned interleaving — 1.12
    // biased high — had no in-JVM warm run).
    val n = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "3000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_REPS", "3").toInt
    val jvms = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_JVMS", "2").toInt
    val loCores = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "2").toInt
    val hiCores = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "8").toInt
    val loRuns = scala.collection.mutable.ArrayBuffer[Double]()
    val hiRuns = scala.collection.mutable.ArrayBuffer[Double]()
    // visits that had to fall back to running in THIS JVM (child spawn
    // failed): recorded per level in the output, because an in-process run
    // violates the JVM-isolation methodology and must be distinguishable
    // from a pinned-child measurement when reading the artifact
    var loInProcess = 0
    var hiInProcess = 0
    (1 to math.max(jvms, 1)).foreach { _ =>
      val (lo, loIso) = frontierLevelIsolated(loCores, n, reps)
      loRuns ++= lo; if (!loIso) loInProcess += 1
      val (hi, hiIso) = frontierLevelIsolated(hiCores, n, reps)
      hiRuns ++= hi; if (!hiIso) hiInProcess += 1
    }
    val tLo = loRuns.min
    val tHi = hiRuns.min
    val eff = (tLo / tHi) / (hiCores.toDouble / loCores)
    val effMedian = (median(loRuns.toSeq) / median(hiRuns.toSeq)) / (hiCores.toDouble / loCores)

    // part 1: headline queries — warm once (jit + parquet footer cache),
    // report min of the timed runs (this host shows multi-x run-to-run
    // variance right after heavy jobs). EVERY headline query gets at least
    // 5 timed reps, unconditionally: the r4 layout's "slow queries get only
    // qreps" escape hatch reintroduced 2-rep noise exactly where the host
    // is dirtiest (right after ~20 min of frontier child JVMs) and printed
    // q_reorg_diff at 2.4x its baseline on unchanged code. A failing query
    // records -1, never a time-to-failure masquerading as a measurement.
    val qreps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "2").toInt
    val spark = GraftSession.get(cpus)
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val results = HeadlineQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val secs =
        try {
          fn(spark, sfDir).count() // warm (discarded)
          val r = math.max(qreps, 5)
          val times = (1 to r).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          times.min
        } catch {
          case e: Throwable => errors += s"$name: ${e.getClass.getSimpleName}"; -1.0
        }
      name -> secs
    }
    spark.stop()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 > 0).map(_._2).sum + loRuns.sum + hiRuns.sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    def arr(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString("[", ",", "]")
    val frontier = f"""{"n_urls":$n,"cores_lo":$loCores,"cores_hi":$hiCores,""" +
      f""""urls_per_sec_lo":${n / tLo}%.0f,"urls_per_sec_hi":${n / tHi}%.0f,""" +
      f""""secs_lo":$tLo%.2f,"secs_hi":$tHi%.2f,""" +
      f""""runs_lo":${arr(loRuns.toSeq)},"runs_hi":${arr(hiRuns.toSeq)},""" +
      f""""in_process_fallbacks_lo":$loInProcess,"in_process_fallbacks_hi":$hiInProcess,""" +
      f""""estimator":"min-of-equal-counts","efficiency_median":$effMedian%.3f,""" +
      f""""scaling_efficiency":$eff%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""errors":$errJson,"frontier":$frontier,"sf":"$sfDir"}""")
  }

  /** Median of the timed runs (average of the middle two for even counts) —
    * the symmetric per-level estimator the scaling gate compares.
    */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) Double.NaN
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Run one level VISIT (setup + discarded warm + `reps` timed runs) in a
    * single pinned child JVM; returns (timed runs, isolated?). Falls back to
    * in-process if the spawn fails — the boolean records that degradation so
    * the emitted artifact can flag it (an in-process run is contaminated by
    * this parent JVM's heap and must never silently pass as a pinned-child
    * measurement).
    */
  def frontierLevelIsolated(cores: Int, n: Long, reps: Int): (Seq[Double], Boolean) =
    spawnChildRuns(cores, Seq("frontierlevel", cores.toString, n.toString, reps.toString))
      .map(rs => (rs, true))
      .getOrElse((frontierLevelRuns(cores, n, reps), false))

  /** In-child: fresh session for this level, setup once, one discarded
    * full-n warm run (faults the working set in, finishes JIT, and absorbs
    * any page-reclaim penalty left by a preceding sibling JVM), then `reps`
    * timed runs — all returned; the parent picks the statistic.
    */
  def frontierLevelRuns(cores: Int, n: Long, reps: Int): Seq[Double] = {
    val spark = GraftSession.builder(cores)
      .appName(s"graft-frontier-$cores").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      run(spark, setup(spark, n / 10), budgetBase = 100) // jit + codegen
      val ctx = setup(spark, n)
      run(spark, ctx, budgetBase = 800) // discarded: faults working set in
      (1 to math.max(reps, 1)).map { _ =>
        val t0 = System.nanoTime()
        run(spark, ctx, budgetBase = 800)
        (System.nanoTime() - t0) / 1e9
      }
    } finally spark.stop()
  }

  /** Back-compat single-number variant (min of [[frontierLevelRuns]]). */
  def frontierLevelSecs(cores: Int, n: Long, reps: Int): Double =
    frontierLevelRuns(cores, n, reps).min

  /** Run `frontierSecs(cores, n)` in a child JVM and parse the result.
    * Falls back to in-process if the spawn fails.
    */
  def frontierSecsIsolated(cores: Int, n: Long): Double =
    spawnChild(cores, Seq("frontier", cores.toString, n.toString))
      .getOrElse(frontierSecs(cores, n))

  /** Spawn a `frontierlevel` child and parse its full rep-time list. */
  private def spawnChildRuns(cores: Int, benchArgs: Seq[String]): Option[Seq[Double]] =
    spawnChildOutput(cores, benchArgs).flatMap(
      _.collectFirst { case l if l.contains("FRONTIER_RUNS=") =>
        l.split("FRONTIER_RUNS=")(1).trim.split(",").map(_.toDouble).toSeq
      })

  private def spawnChild(cores: Int, benchArgs: Seq[String]): Option[Double] =
    spawnChildOutput(cores, benchArgs).flatMap(
      _.collectFirst { case l if l.contains("FRONTIER_SECS=") =>
        l.split("FRONTIER_SECS=")(1).trim.toDouble
      })

  private def spawnChildOutput(cores: Int, benchArgs: Seq[String],
      extraEnv: Map[String, String] = Map.empty): Option[List[String]] = {
    try {
      val java = s"${System.getProperty("java.home")}/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      // pinned heap + ParallelGC: this sandbox kernel pays pathological sys
      // time for page commit/uncommit churn — G1's heap resizing makes the
      // same job up to 5x slower here (measured); both levels get the same
      // flags so the ratio is honest.
      // taskset pins the WHOLE process (GC, JIT, Spark daemon threads) to
      // exactly `cores` host cores — without it the "N-core" level borrows
      // the 32-core host's capacity through its ~23 default ParallelGC
      // threads and unpinned service threads, which a real N-core executor
      // node does not have. This is the standard small-machine emulation.
      val pin =
        if (new _root_.java.io.File("/usr/bin/taskset").exists)
          Seq("/usr/bin/taskset", "-c", s"0-${cores - 1}")
        else Seq.empty
      val cmd = (pin ++ Seq(java) ++ addOpens ++ Seq(
        "-Xms12g", "-Xmx12g", "-XX:+UseParallelGC",
        s"-XX:ParallelGCThreads=$cores", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.Bench") ++ benchArgs).toArray
      val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      p.waitFor()
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Per-level state the timed round probes/merges against (the analog of
    * the checkpoint a real round reads): the seen table and its prebuilt
    * bloom shard blobs.
    */
  private final case class FrontierCtx(n: Long, cap: Long, seen: DataFrame,
      blooms: DataFrame, provider: SeenSet.BloomShardProvider)

  /** One frontier round over `n` synthetic URLs (a third already seen),
    * timed after a warm-up pass at n/10. Fresh SparkSession per parallelism
    * level so the executor-thread count really differs.
    */
  def frontierSecs(cores: Int, n: Long): Double = {
    val spark = GraftSession.builder(cores)
      .appName(s"graft-frontier-$cores").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      run(spark, setup(spark, n / 10), budgetBase = 100) // warm-up: jit + codegen
      val ctx = setup(spark, n)
      val t0 = System.nanoTime()
      run(spark, ctx, budgetBase = 800)
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }

  private def genFrontier(spark: SparkSession, n: Long): DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts)
      .select(concat(lit("HTTP://Host"), pmod(col("id"), lit(256)).cast("string"),
        lit(".Example.COM:80/p/./x/../"), col("id").cast("string"),
        lit("#f")).as("raw_url"))
      .select(canonicalize_url(col("raw_url")).as("url"))
      .select(col("url"), xxhash64(col("url")).as("url_hash"),
        url_host(col("url")).as("host"), url_path(col("url")).as("path"),
        pmod(xxhash64(col("url")), lit(10)).cast("int").as("priority"),
        (xxhash64(col("url")) % 100000).as("seq"))
  }

  /** Untimed: build the checkpoint state a round starts from — the seen set
    * (every third URL) and its bloom shard blobs, materialized.
    */
  private def setup(spark: SparkSession, n: Long): FrontierCtx = {
    val seen = genFrontier(spark, n).filter(col("seq") % 3 === 0)
      .select("url_hash").localCheckpoint(true)
    val cap = math.max(n / SeenSet.DefaultShards, 1024L)
    val blooms = SeenSet.buildBloomsDf(seen, cap).localCheckpoint(true)
    FrontierCtx(n, cap, seen, blooms, SeenSet.broadcastProvider(spark, blooms))
  }

  /** TIMED: one full frontier round — canonicalize → hash → bloom probe +
    * anti-join dedup → robots gate → salted politeness top-k →
    * fetch+decode+PSNR-validate the scheduled pages (the real per-fetch work:
    * image payload validation is the north-rule contract and the
    * compute-dominant stage exactly as real fetch+decode would be) → OR-merge
    * the committed batch's delta blooms into the persisted shard blobs (the
    * per-round O(delta) seen-set maintenance).
    */
  private def run(spark: SparkSession, ctx: FrontierCtx, budgetBase: Int): Unit = {
    val timing = sys.env.contains("SPARK_GRAFT_PHASE_TIMING")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      if (timing) println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val hosts = 256
    val frontier = genFrontier(spark, ctx.n)
    val hostState = spark.range(hosts)
      .select(concat(lit("host"), col("id").cast("string"), lit(".example.com")).as("host"),
        array(lit("/private/")).as("robots_disallow"),
        (lit(1L) + col("id") % 5).as("min_delay_ms"),
        (lit(budgetBase) + col("id").cast("int") % 100).as("budget"))

    // dedup + enqueue-time robots gate (the CrawlJob shape: both run over
    // the round's candidates BEFORE anything persists), then materialize
    // once, like the queue table a real round schedules from — the
    // scheduler reads its input twice (narrow rank + payload re-join).
    // Only the scheduling columns are cached: the gate already consumed
    // `path`, and the block-manager write is the round's worst-scaling
    // phase (memory-bandwidth-bound), so every cached byte is paid at 1/4
    // the parallel efficiency of the fetch stage.
    val gated = phase("dedup_gate_cache") {
      Scheduler.robotsGate(
        SeenSet.filterNew(spark, frontier, ctx.seen, ctx.provider), hostState)
        .select("host", "url", "url_hash", "seq", "priority")
        .localCheckpoint(true)
    }
    val scheduled = Scheduler.schedule(gated, hostState, roundMillis = 10000L).persist()
    if (timing) phase("schedule")(scheduled.count())

    // fetch + payload validation: decode the page's image and check PSNR
    // against the source raster (ImageValidate semantics, inlined on the
    // deterministic generator). Repartition to ~4 tasks/core first: the
    // compute-dominant stage must not inherit the scheduler's few output
    // partitions, or one straggler task hides a whole core at the 4N level.
    import spark.implicits._
    val fetchParts = spark.sparkContext.defaultParallelism * 4
    val validated = scheduled
      .select(pmod(col("url_hash"), lit(4096)).as("img"))
      .repartition(fetchParts, col("img"))
      .as[Long].mapPartitions(_.map { i =>
        val img = graft.fixtures.ImageGen.raster(i)
        val fmt = graft.fixtures.ImageGen.fmtOf(i)
        val bytes = graft.fixtures.ImageGen.encode(img, fmt)
        val decoded = graft.validate.ImageValidate.decode(bytes)
        val p = graft.validate.ImageValidate.psnr(img, decoded)
        if (fmt == "png") (if (p.isPosInfinity) 1L else 0L)
        else (if (p >= graft.validate.ImageValidate.PsnrGateDb) 1L else 0L)
      })
    phase("fetch_validate") {
      require(validated.reduce(_ + _) > 0, "no pages validated")
    }

    // O(delta) seen-set maintenance for the committed batch
    phase("bloom_merge") {
      val merged = SeenSet.mergeBlooms(ctx.blooms,
        SeenSet.bloomDelta(scheduled.select("url_hash"), ctx.cap))
      require(merged.count() == SeenSet.DefaultShards, "bloom merge lost shards")
    }
    scheduled.unpersist()
  }

  /** Diagnostic: one pinned child per level with per-phase timing printed
    * (`SPARK_GRAFT_PHASE_TIMING`). Not part of the gate measurement.
    */
  def frontierPhaseDiag(cores: Int, n: Long, reps: Int): Unit =
    spawnChildOutput(cores, Seq("frontierlevel", cores.toString, n.toString, reps.toString),
      Map("SPARK_GRAFT_PHASE_TIMING" -> "1"))
      .foreach(_.filter(l => l.contains("PHASE") || l.contains("FRONTIER_RUNS"))
        .foreach(l => println(s"cores=$cores $l")))
}
