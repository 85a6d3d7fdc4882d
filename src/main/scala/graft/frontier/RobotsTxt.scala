package graft.frontier

/** Minimal robots.txt parser feeding [[Scheduler.robotsDisallowed]]'s
  * prefix rules — the piece that turns a fetched robots.txt body into the
  * per-host `robots_disallow` column of the host-state side input.
  *
  * Scope (the subset the gate consumes): User-agent grouping with longest-
  * agent-match selection, Disallow prefix rules, empty Disallow = allow all,
  * comments and blank lines. Allow-precedence and wildcards are out of
  * scope — the scheduler gate is a prefix test (north_rule: robots-GATED
  * scheduling, not a full REP implementation), and unknown directives are
  * ignored per the de-facto standard.
  *
  * Parsing happens once per host at host-state build time (one row per
  * host), never per frontier row.
  */
object RobotsTxt {

  final case class Group(agents: Seq[String], disallow: Seq[String])

  def parseGroups(text: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = Vector.empty[String]
    var rules = Vector.empty[String]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
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
          case _ => if (agents.nonEmpty) inRules = true // any other directive closes the agent list
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** Disallow prefixes applying to `agent`: the group whose agent token is
    * the LONGEST substring match of our agent name wins; the `*` group is
    * the fallback; no group at all = everything allowed.
    */
  def disallowFor(text: String, agent: String): Seq[String] = {
    val a = agent.toLowerCase
    val groups = parseGroups(text)
    val matching = groups
      .flatMap(g => g.agents.filter(t => t != "*" && a.contains(t)).maxByOption(_.length)
        .map(t => (t.length, g)))
    matching.maxByOption(_._1).map(_._2.disallow).getOrElse(
      groups.find(_.agents.contains("*")).map(_.disallow).getOrElse(Seq.empty))
  }
}
