package graft.frontier

/** Minimal robots.txt parser feeding [[Scheduler.robotsDisallowed]]'s
  * prefix rules — the piece that turns a fetched robots.txt body into the
  * per-host `robots_disallow` column of the host-state side input.
  *
  * Scope: User-agent grouping with longest-agent-match selection,
  * Disallow/Allow prefix rules (full longest-match precedence via
  * [[isAllowed]]; the scheduler's columnar gate consumes the Disallow
  * prefixes only — north_rule: robots-GATED scheduling — a conservative
  * under-approximation, seam documented at [[isAllowed]]), empty Disallow
  * = allow all, comments and blank lines. Wildcards (`*`, `$`) are out of
  * scope, and unknown directives are ignored per the de-facto standard.
  *
  * Parsing happens once per host at host-state build time (one row per
  * host), never per frontier row.
  */
object RobotsTxt {

  final case class Group(agents: Seq[String], disallow: Seq[String],
      crawlDelay: Option[Double] = None, allow: Seq[String] = Nil)

  def parseGroups(text: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = Vector.empty[String]
    var rules = Vector.empty[String]
    var allows = Vector.empty[String]
    var delay: Option[Double] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay, allows)
      agents = Vector.empty; rules = Vector.empty; allows = Vector.empty
      delay = None; inRules = false
    }
    (if (text == null) "" else text).linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush() // a new agent line after rules starts a new group
            agents :+= value.toLowerCase
          case "disallow" =>
            inRules = true
            if (value.nonEmpty) rules :+= value // empty Disallow = allow all
          case "allow" =>
            inRules = true
            if (value.nonEmpty) allows :+= value // empty Allow is a no-op
          case "crawl-delay" =>
            inRules = true
            // non-standard but honored by most large crawlers; malformed or
            // negative values are ignored, last valid one in a group wins
            delay = value.toDoubleOption.filter(d => d >= 0 && d.isFinite)
              .orElse(delay)
          case _ => if (agents.nonEmpty) inRules = true // any other directive closes the agent list
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** The group applying to `agent`: longest agent-token substring match
    * wins; the `*` group is the fallback. */
  private def groupFor(text: String, agent: String): Option[Group] = {
    val a = agent.toLowerCase
    val groups = parseGroups(text)
    val matching = groups
      .flatMap(g => g.agents.filter(t => t != "*" && a.contains(t)).maxByOption(_.length)
        .map(t => (t.length, g)))
    matching.maxByOption(_._1).map(_._2)
      .orElse(groups.find(_.agents.contains("*")))
  }

  /** Crawl-delay seconds for `agent` under the same group selection as
    * [[disallowFor]]; None when the winning group (or the whole file)
    * declares none.
    */
  def crawlDelayFor(text: String, agent: String): Option[Double] =
    groupFor(text, agent).flatMap(_.crawlDelay)

  /** The [[Scheduler]] host-state input derived from robots: Crawl-delay in
    * milliseconds, floored at 1 ms (the scheduler's own floor), `defaultMs`
    * when the file declares none. This is the link from a fetched
    * robots.txt body to the per-host `min_delay_ms` politeness column.
    */
  def minDelayMs(text: String, agent: String, defaultMs: Long): Long =
    crawlDelayFor(text, agent)
      .map(d => math.max(1L, math.round(d * 1000.0))).getOrElse(defaultMs)

  /** Disallow prefixes applying to `agent`: the group whose agent token is
    * the LONGEST substring match of our agent name wins; the `*` group is
    * the fallback; no group at all = everything allowed.
    */
  def disallowFor(text: String, agent: String): Seq[String] =
    groupFor(text, agent).map(_.disallow).getOrElse(Seq.empty)

  /** Full REP Allow/Disallow precedence (Google's published semantics,
    * also RFC 9309 §2.2.2): among the rules whose PREFIX matches the path,
    * the LONGEST wins; on an exact length tie the Allow rule wins; no
    * matching rule = allowed. This is the per-URL decision for callers
    * honoring `Allow:` carve-outs (e.g. `Disallow: /` + `Allow: /public`).
    *
    * The [[Scheduler]]'s columnar enqueue gate deliberately stays the
    * Disallow-prefix test (north_rule scope: robots-GATED scheduling) — a
    * conservative under-approximation that never fetches a disallowed URL;
    * swapping this function into that gate is the documented seam for
    * full-REP fidelity. Wildcard (`*`, `$`) rules remain out of scope for
    * both paths.
    */
  def isAllowed(text: String, agent: String, path: String): Boolean =
    groupFor(text, agent).forall { g =>
      val d = g.disallow.filter(path.startsWith).map(_.length).maxOption
      val a = g.allow.filter(path.startsWith).map(_.length).maxOption
      (d, a) match {
        case (None, _) => true
        case (Some(dl), Some(al)) => al >= dl
        case _ => false
      }
    }
}
