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
}
