package graft.frontier

import org.scalatest.funsuite.AnyFunSuite

class RobotsTxtSpec extends AnyFunSuite {

  val robots =
    """# example robots.txt
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp/
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /graft-only/
      |
      |User-agent: greedybot
      |Disallow: /
      |
      |User-agent: freebot
      |Disallow:
      |""".stripMargin

  test("wildcard group applies to unknown agents") {
    assert(RobotsTxt.disallowFor(robots, "somebot/1.0") === Seq("/private/", "/tmp/"))
  }

  test("specific agent group wins over wildcard; shared group lists both agents") {
    assert(RobotsTxt.disallowFor(robots, "GraftBot/2.1") === Seq("/graft-only/"))
    assert(RobotsTxt.disallowFor(robots, "otherbot") === Seq("/graft-only/"))
  }

  test("Disallow: / blocks everything; empty Disallow allows everything") {
    assert(RobotsTxt.disallowFor(robots, "greedybot") === Seq("/"))
    assert(RobotsTxt.disallowFor(robots, "freebot") === Seq.empty)
  }

  test("no robots.txt or no groups = allow all; comments and junk ignored") {
    assert(RobotsTxt.disallowFor("", "any") === Seq.empty)
    assert(RobotsTxt.disallowFor(null, "any") === Seq.empty)
    assert(RobotsTxt.disallowFor("garbage\nlines: here\n", "any") === Seq.empty)
  }

  test("parsed rules drive the scheduler's prefix gate") {
    val rules = RobotsTxt.disallowFor(robots, "unknown")
    assert(rules.exists(r => "/private/data.html".startsWith(r)))
    assert(!rules.exists(r => "/public/data.html".startsWith(r)))
  }

  val robotsDelay =
    """User-agent: *
      |Crawl-delay: 2
      |Disallow: /private/
      |
      |User-agent: graftbot
      |Crawl-delay: 0.5
      |Disallow: /graft-only/
      |
      |User-agent: slowbot
      |Crawl-delay: not-a-number
      |Crawl-delay: -3
      |Disallow: /x/
      |""".stripMargin

  test("crawl-delay follows the same group selection as disallow") {
    assert(RobotsTxt.crawlDelayFor(robotsDelay, "GraftBot/2.1") === Some(0.5))
    assert(RobotsTxt.crawlDelayFor(robotsDelay, "somebot") === Some(2.0))
  }

  test("malformed and negative crawl-delay values are ignored") {
    assert(RobotsTxt.crawlDelayFor(robotsDelay, "slowbot") === None)
  }

  test("no crawl-delay anywhere yields None") {
    assert(RobotsTxt.crawlDelayFor(robots, "graftbot") === None)
    assert(RobotsTxt.crawlDelayFor("", "any") === None)
  }

  test("minDelayMs converts to the scheduler's politeness column") {
    // 0.5 s → 500 ms; wildcard 2 s → 2000 ms; absent → caller default;
    // sub-ms delays floor at the scheduler's own 1 ms floor
    assert(RobotsTxt.minDelayMs(robotsDelay, "graftbot", 1000L) === 500L)
    assert(RobotsTxt.minDelayMs(robotsDelay, "somebot", 1000L) === 2000L)
    assert(RobotsTxt.minDelayMs(robots, "graftbot", 1234L) === 1234L)
    assert(RobotsTxt.minDelayMs("User-agent: *\nCrawl-delay: 0.0001\n", "b", 9L) === 1L)
  }

  test("crawl-delay between agent lines does not split the group") {
    // a directive closes the AGENT LIST (new user-agent after it starts a
    // new group) but disallow rules that follow still land in this group
    val t = "User-agent: a\nCrawl-delay: 1\nDisallow: /d/\nUser-agent: b\nDisallow: /e/\n"
    assert(RobotsTxt.disallowFor(t, "a") === Seq("/d/"))
    assert(RobotsTxt.crawlDelayFor(t, "a") === Some(1.0))
    assert(RobotsTxt.disallowFor(t, "b") === Seq("/e/"))
    assert(RobotsTxt.crawlDelayFor(t, "b") === None)
  }

  test("Allow carve-out: longest matching rule wins (RFC 9309 precedence)") {
    val t = "User-agent: *\nDisallow: /\nAllow: /public/"
    assert(!RobotsTxt.isAllowed(t, "graftbot", "/private/a"))
    assert(RobotsTxt.isAllowed(t, "graftbot", "/public/a"))
    // a deeper Disallow re-blocks inside the carve-out
    val t2 = t + "\nDisallow: /public/tmp/"
    assert(RobotsTxt.isAllowed(t2, "graftbot", "/public/a"))
    assert(!RobotsTxt.isAllowed(t2, "graftbot", "/public/tmp/x"))
  }

  test("Allow wins exact-length ties; no matching rule allows; no group allows") {
    val tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir2"
    // '/dir/' and '/dir2' are both length 5; only one matches each path
    assert(!RobotsTxt.isAllowed(tie, "graftbot", "/dir/x"))
    assert(RobotsTxt.isAllowed(tie, "graftbot", "/dir2x"))
    val exactTie = "User-agent: *\nDisallow: /a/\nAllow: /a/"
    assert(RobotsTxt.isAllowed(exactTie, "graftbot", "/a/x"))
    assert(RobotsTxt.isAllowed("User-agent: *\nDisallow: /x/", "graftbot", "/y"))
    assert(RobotsTxt.isAllowed("", "graftbot", "/anything"))
  }

  test("Allow respects group selection; scheduler's disallow view unchanged") {
    val t = "User-agent: graftbot\nDisallow: /\nAllow: /ok/\n\n" +
      "User-agent: *\nDisallow: /other/"
    assert(RobotsTxt.isAllowed(t, "graftbot-1.0", "/ok/page"))
    assert(!RobotsTxt.isAllowed(t, "graftbot-1.0", "/nope"))
    assert(RobotsTxt.isAllowed(t, "strangerbot", "/nope")) // * group: only /other/
    // the conservative columnar gate still sees only the Disallow prefixes
    assert(RobotsTxt.disallowFor(t, "graftbot-1.0") === Seq("/"))
  }
}
