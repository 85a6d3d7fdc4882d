package graft.fixtures

import graft.functions.{GraftHash, UrlCodec}
import graft.schema.HostState

/** The deterministic synthetic web: the "remote chain" analog of the
  * reference's `reorgd` simulator (/root/reference/cmd/reorgd/main.go), with
  * its dice replaced by seeded mixing (FIXTURES.md intro) so every run —
  * single-threaded oracle or distributed engine, at any parallelism —
  * observes the identical web.
  *
  * Everything is a pure function of the URL (plus round for failures):
  * page content (image id), out-links, priorities, per-host politeness
  * state, injected transient fetch failures, and the scripted revision
  * (reorg-analog) events.
  *
  * Parity notes (pinned by CrawlParitySpec):
  *  - url_hash = Spark builtin xxhash64 (via [[GraftHash.xxhash64]]);
  *  - priority(url) = floorMod(xxhash64(url), 10) — expressible in Spark as
  *    `pmod(xxhash64(col), lit(10))` so the engine derives it columnar.
  */
final case class WebConfig(
    seed: Long = 42L,
    numHosts: Int = 16,
    numSeeds: Int = 60,
    numImages: Int = 1000,
    zipfS: Double = 1.2,
    failMod: Int = 23,      // ~4% transient fetch failures; 0 = never fail
    maxOutlinks: Int = 3,
    rounds: Int = 6,
    windowK: Int = 8,
    roundMillis: Long = 1000L,
    // > 0 scripts a CORRELATED revision event: at that round EVERY host
    // revises at once (the CDN-purge / site-migration case) — exercises the
    // distributed replacement fetch under fan-out instead of 1-2 hosts
    correlatedRevRound: Int = 0)

object SyntheticWeb {
  import GraftHash.{mix64, xxhash64}

  def hostName(i: Int): String = f"host$i%02d.test"

  /** Zipf(s) sampling over hosts — hot-host skew on purpose (FIXTURES.md §3). */
  def pickHost(cfg: WebConfig, k: Long): String = {
    val weights = (0 until cfg.numHosts).map(i => 1.0 / math.pow(i + 1, cfg.zipfS))
    val total = weights.sum
    val u = ((mix64(k) >>> 11).toDouble / (1L << 53).toDouble) * total
    var acc = 0.0
    var i = 0
    while (i < cfg.numHosts - 1 && acc + weights(i) < u) { acc += weights(i); i += 1 }
    hostName(i)
  }

  def seedUrls(cfg: WebConfig): Seq[String] =
    (0 until cfg.numSeeds).map { j =>
      val h = pickHost(cfg, mix64(cfg.seed, j.toLong))
      s"http://$h/p/s$j"
    }

  def priorityOf(canonicalUrl: String): Int =
    java.lang.Math.floorMod(xxhash64(canonicalUrl), 10L).toInt

  def imageIdOf(canonicalUrl: String, numImages: Int): String =
    f"img${java.lang.Math.floorMod(xxhash64(canonicalUrl), numImages.toLong)}%010d"

  /** Discovered out-links of a page — the frontier-growth analog of
    * block→parent lineage. ~70% same-host; ~10% land under a robots-disallowed
    * prefix to exercise the gate.
    */
  def outlinksOf(cfg: WebConfig, canonicalUrl: String): Seq[String] = {
    val h = xxhash64(canonicalUrl)
    val k = java.lang.Math.floorMod(mix64(h, 0x0eadL), (cfg.maxOutlinks + 1).toLong).toInt
    (0 until k).map { i =>
      val sameHost = java.lang.Math.floorMod(mix64(h, i * 2L + 1L), 100L) < 70
      val tgtHost =
        if (sameHost) UrlCodec.hostOf(canonicalUrl)
        else pickHost(cfg, mix64(h, i * 2L + 2L))
      val disallowed = java.lang.Math.floorMod(mix64(h, i * 7L + 3L), 10L) == 0
      val token = java.lang.Long.toHexString(mix64(h, i + 101L) >>> 16)
      val prefix = if (disallowed) "/private" else "/p"
      s"http://$tgtHost$prefix/$token"
    }
  }

  /** Transient failure injection, a pure function of (url, round) — the
    * fetch-error path that must trigger prefix-commit (SURVEY.md §4 inv 1).
    * A failed URL succeeds on a later round.
    */
  def failsAt(cfg: WebConfig, canonicalUrl: String, round: Long): Boolean =
    cfg.failMod > 0 &&
      java.lang.Math.floorMod(mix64(xxhash64(canonicalUrl), round * 0x9e37L), cfg.failMod.toLong) == 0

  /** The robots.txt body host `i` serves (observable data; the gate rules
    * come from PARSING this, not from a hand-built list).
    */
  def robotsTxtOf(cfg: WebConfig, i: Int): String =
    if (i % 3 == 0)
      "# synthetic host policy\nUser-agent: noneofus\nDisallow: /\n\nUser-agent: *\nDisallow: /private/\n"
    else
      "User-agent: *\nDisallow:\n"

  /** Politeness + robots side input: one row per host; disallow rules are
    * parsed from the host's robots.txt text via [[graft.frontier.RobotsTxt]].
    */
  def hostStates(cfg: WebConfig): Seq[HostState] =
    (0 until cfg.numHosts).map { i =>
      HostState(
        host = hostName(i),
        robots_disallow =
          graft.frontier.RobotsTxt.disallowFor(robotsTxtOf(cfg, i), "graftbot"),
        min_delay_ms = 100L + (i % 5) * 100L,
        budget = 2 + (i % 4))
    }

  // ---- scripted revisions (the reorg analog, FIXTURES.md §4) -------------

  /** A scripted frontier revision: at `round`, host `host` invalidates the
    * subset of its already-served pages that [[touches]] selects, and starts
    * serving `depth + extra` replacement pages.
    *
    * The script is INTERNAL to the synthetic web: neither the engine nor the
    * reference walker reads it. Both observe revisions only through fetched
    * data — [[pageVersion]] and [[replacementsFor]] — the way blockspider
    * observes a reorg only through a parent-hash mismatch on fetched blocks
    * (/root/reference/crawler/blocks.go:276-288).
    */
  final case class Revision(round: Long, host: String, depth: Int, extra: Int)

  def revisions(cfg: WebConfig): Seq[Revision] = {
    val scripted = Seq(2L, 4L).filter(_ <= cfg.rounds).map { r =>
      Revision(
        round = r,
        host = pickHost(cfg, mix64(777L, r)),
        depth = 1 + java.lang.Math.floorMod(mix64(888L, r), 3L).toInt,
        extra = java.lang.Math.floorMod(mix64(999L, r), 2L).toInt)
    }
    val correlated =
      if (cfg.correlatedRevRound > 0 && cfg.correlatedRevRound <= cfg.rounds)
        (0 until cfg.numHosts).map { i =>
          Revision(
            round = cfg.correlatedRevRound.toLong,
            host = hostName(i),
            depth = 1 + java.lang.Math.floorMod(mix64(555L, i.toLong), 2L).toInt,
            extra = java.lang.Math.floorMod(mix64(666L, i.toLong), 2L).toInt)
        }
      else Seq.empty
    scripted ++ correlated
  }

  /** Whether a revision invalidates a given page — pure in (rev, url_hash),
    * ~1/2 of a revised host's pages per event.
    */
  private def touches(rev: Revision, urlHash: Long): Boolean =
    java.lang.Math.floorMod(mix64(urlHash, mix64(rev.round, 0x5eedL)), 2L) == 0

  /** OBSERVABLE page version at `round`: how many revisions of this page's
    * host have invalidated it so far. A crawler that recorded the version at
    * fetch time detects a revision by re-reading this and seeing it grow —
    * the parent-link-mismatch analog. Pure, so the distributed engine and
    * the serial walker observe the identical web.
    */
  def pageVersion(cfg: WebConfig, canonicalUrl: String, round: Long): Long = {
    val host = UrlCodec.hostOf(canonicalUrl)
    val h = xxhash64(canonicalUrl)
    revisions(cfg).count(r => r.host == host && r.round <= round && touches(r, h)).toLong
  }

  /** OBSERVABLE replacement pages host `host` serves after revising at
    * `round` (the sidechain-blocks analog) — empty unless a revision event
    * is live for exactly (host, round).
    */
  def replacementsFor(cfg: WebConfig, host: String, round: Long): Seq[String] =
    revisions(cfg).filter(r => r.host == host && r.round == round).flatMap { r =>
      (0 until r.depth + r.extra).map(i => replacementUrl(host, round, i))
    }

  def replacementUrl(host: String, round: Long, i: Int): String =
    s"http://$host/rev/r${round}x$i"
}
