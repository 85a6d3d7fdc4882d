package graft.crawl

import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.functions.{GraftHash, UrlCodec}
import scala.collection.mutable

/** The single-threaded reference walker: a trivially-sequential
  * implementation of the crawl spec, used as the ordering/seen-set oracle the
  * distributed engine must match exactly (FIXTURES.md §3 `expected_order` /
  * `expected_seen`; the role blockspider's serial commit order plays in
  * /root/reference/syncronizer/synchronizer.go:14-36).
  *
  * Deliberately implemented with plain loops and collections — no Spark, no
  * shared scheduling code with [[CrawlJob]] — so an engine bug cannot cancel
  * out in the comparison. The only shared code is the *input*: the synthetic
  * web ([[SyntheticWeb]]) and the url canonicalize/hash primitives, which
  * define the data, not the crawl semantics.
  *
  * Crawl spec implemented here (and, distributed, in CrawlJob):
  *  round r = 1..R:
  *   1. revision detection (DATA-driven, the reorg-trigger analog of
  *      /root/reference/crawler/blocks.go:276-288): re-read each window
  *      entry's current page version; entries whose version grew since fetch
  *      are retracted (emit DROPPED; remove from seen), and — only when a
  *      mismatch was detected — the host's replacement pages are fetched
  *      (assign fresh seq+ord; emit ACCEPTED, oldest first; add to
  *      seen+window). The revision script is never read directly.
  *   2. robots gate AT ENQUEUE: a discovered/seed URL whose path matches a
  *      disallow prefix of its host never enters the queue (never consumes a
  *      seq, never fetched, never seen) — gate rules are static per host, so
  *      gating once at enqueue is equivalent to re-gating every round and is
  *      what keeps the engine's frontier maintenance O(delta)/round.
  *   3. schedule per host: capacity = min(budget, roundMillis/min_delay_ms);
  *      order = (priority desc, seq asc); take `capacity`.
  *   4. fetch in order; first failure in a host's batch stops that host's
  *      commits for the round (prefix commit) — survivors stay queued.
  *   5. committed: emit ACCEPTED (ord = per-host monotone counter), add to
  *      seen, push to the K-deep window, remove from queue.
  *   6. out-links of committed pages: canonicalize; drop if already seen,
  *      queued, or duplicated in-round; per host, assign seq in url_hash
  *      order (parent-independent, hence parallelism-independent).
  */
object RefWalker {

  final case class Emit(
      round: Long, status: String, host: String, seq: Long, ord: Long,
      url_hash: Long, url: String, priority: Int)

  final case class QEntry(url: String, url_hash: Long, path: String, seq: Long, priority: Int)
  final case class WEntry(ord: Long, seq: Long, url_hash: Long, url: String, ver: Long)

  final case class Result(emits: Vector[Emit], seen: Set[Long],
      queueSize: Int, fetchedPages: Vector[(Long, String)]) // (url_hash, image_id)

  def run(cfg: WebConfig): Result = {
    val hostStates = SyntheticWeb.hostStates(cfg).map(h => h.host -> h).toMap

    val queue = mutable.Map[String, mutable.ArrayBuffer[QEntry]]()
    val queuedHashes = mutable.Set[Long]()
    val seen = mutable.Set[Long]()
    val window = mutable.Map[String, mutable.ArrayBuffer[WEntry]]()
    val nextSeq = mutable.Map[String, Long]().withDefaultValue(1L)
    val nextOrd = mutable.Map[String, Long]().withDefaultValue(1L)
    val emits = Vector.newBuilder[Emit]
    val pages = Vector.newBuilder[(Long, String)]

    def enqueue(host: String, canonical: String): Unit = {
      val h = GraftHash.xxhash64(canonical)
      val path = UrlCodec.pathOf(canonical)
      // robots gate at enqueue: disallowed URLs never enter the queue
      if (hostStates(host).robots_disallow.exists(path.startsWith)) return
      if (!seen.contains(h) && !queuedHashes.contains(h)) {
        val e = QEntry(canonical, h, path,
          nextSeq(host), SyntheticWeb.priorityOf(canonical))
        nextSeq(host) = nextSeq(host) + 1
        queue.getOrElseUpdate(host, mutable.ArrayBuffer()) += e
        queuedHashes += h
      }
    }

    // seeds: per host, seq assigned in seed-index order
    SyntheticWeb.seedUrls(cfg).foreach { raw =>
      val c = UrlCodec.canonicalize(raw)
      enqueue(UrlCodec.hostOf(c), c)
    }

    for (round <- 1L to cfg.rounds.toLong) {
      // 1. DATA-DRIVEN revision detection: re-read each window entry's
      // current page version and compare to the version recorded at fetch
      // time (the parent-hash-mismatch analog) — the walker is never told
      // which hosts revised; only on a detected mismatch does it fetch the
      // host's replacement pages.
      window.keys.toSeq.sorted.foreach { host =>
        val w = window(host)
        val dropped = w.filter(e => SyntheticWeb.pageVersion(cfg, e.url, round) > e.ver)
          .sortBy(-_.ord)
        if (dropped.nonEmpty) {
          dropped.foreach { e =>
            emits += Emit(round, "DROPPED", host, e.seq, e.ord, e.url_hash,
              e.url, SyntheticWeb.priorityOf(e.url))
            seen -= e.url_hash
          }
          window(host) = w.filterNot(e => dropped.exists(_.ord == e.ord))
          SyntheticWeb.replacementsFor(cfg, host, round).foreach { raw =>
            val url = UrlCodec.canonicalize(raw)
            val h = GraftHash.xxhash64(url)
            val seq = nextSeq(host); nextSeq(host) = seq + 1
            val ord = nextOrd(host); nextOrd(host) = ord + 1
            emits += Emit(round, "ACCEPTED", host, seq, ord, h, url,
              SyntheticWeb.priorityOf(url))
            seen += h
            val wb = window.getOrElseUpdate(host, mutable.ArrayBuffer())
            wb += WEntry(ord, seq, h, url, SyntheticWeb.pageVersion(cfg, url, round))
            if (wb.size > cfg.windowK)
              window(host) = wb.sortBy(_.ord).takeRight(cfg.windowK)
          }
        }
      }

      // 2-4. schedule + fetch + prefix commit
      val newlyDiscovered = mutable.ArrayBuffer[(String, String)]() // (host, url)
      queue.keys.toSeq.sorted.foreach { host =>
        val st = hostStates(host)
        val cap = math.min(st.budget.toLong, cfg.roundMillis / math.max(st.min_delay_ms, 1L)).toInt
        val batch = queue(host).sortBy(e => (-e.priority, e.seq)).take(cap)
        var failed = false
        batch.foreach { e =>
          if (!failed) {
            if (SyntheticWeb.failsAt(cfg, e.url, round)) {
              failed = true // e and everything after stay queued (prefix commit)
            } else {
              val ord = nextOrd(host); nextOrd(host) = ord + 1
              emits += Emit(round, "ACCEPTED", host, e.seq, ord, e.url_hash, e.url, e.priority)
              pages += ((e.url_hash, SyntheticWeb.imageIdOf(e.url, cfg.numImages)))
              seen += e.url_hash
              queuedHashes -= e.url_hash
              queue(host) = queue(host).filterNot(_.url_hash == e.url_hash)
              val wb = window.getOrElseUpdate(host, mutable.ArrayBuffer())
              wb += WEntry(ord, e.seq, e.url_hash, e.url,
                SyntheticWeb.pageVersion(cfg, e.url, round))
              if (wb.size > cfg.windowK)
                window(host) = wb.sortBy(_.ord).takeRight(cfg.windowK)
              SyntheticWeb.outlinksOf(cfg, e.url).foreach { raw =>
                val c = UrlCodec.canonicalize(raw)
                newlyDiscovered += ((UrlCodec.hostOf(c), c))
              }
            }
          }
        }
      }

      // 6. enqueue discoveries: in-round dedup, per-host url_hash order
      newlyDiscovered
        .distinct
        .groupBy(_._1)
        .toSeq.sortBy(_._1)
        .foreach { case (host, urls) =>
          urls.map(_._2).distinct
            .sortBy(GraftHash.xxhash64(_))
            .foreach(u => enqueue(host, u))
        }
    }

    Result(emits.result(), seen.toSet,
      queue.values.map(_.size).sum, pages.result())
  }
}
