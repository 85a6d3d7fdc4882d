package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PII scrub contract: span counts, exact redaction output, chain
  * order, and idempotence.
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def scrub(texts: String*): Seq[(Int, Int, Int, String)] =
    texts.toDF("t").select(
      Pii.emailCount(col("t")), Pii.ipv4Count(col("t")),
      Pii.phoneCount(col("t")), Pii.redact(col("t")))
      .as[(Int, Int, Int, String)].collect().toSeq

  test("counts and redaction on one of each span type") {
    val Seq((e, i, p, red)) = scrub(
      "mail bob.smith+x@sub.example.org or 192.168.1.254 then call +44 123-4567 end")
    assert((e, i, p) === ((1, 1, 1)))
    assert(red === "mail <EMAIL> or <IP> then call <PHONE> end")
  }

  test("clean text passes through untouched") {
    val Seq((e, i, p, red)) = scrub("the quick brown fox version 2.5 at 3 pm")
    assert((e, i, p) === ((0, 0, 0)))
    assert(red === "the quick brown fox version 2.5 at 3 pm")
  }

  test("multiple occurrences are all counted and replaced") {
    val Seq((e, i, p, red)) = scrub("a@b.co c@d.org 1.2.3.4 5.6.7.8 +1 555-0100 +9 111-2222")
    assert((e, i, p) === ((2, 2, 2)))
    assert(red === "<EMAIL> <EMAIL> <IP> <IP> <PHONE> <PHONE>")
  }

  test("redaction is idempotent (placeholders never re-match)") {
    val once = Pii.redact(col("t"))
    val got = Seq("x a@b.org 10.0.0.1 +1 555-0100 y").toDF("t")
      .select(once.as("r1"), Pii.redact(once).as("r2"))
      .as[(String, String)].collect().head
    assert(got._1 === got._2)
  }

  test("numeric mail host: email rule skips (no alpha TLD), IP rule takes the host") {
    // documented chain-order behavior: "a@10.0.0.1" is not a match for the
    // email pattern (TLD must be alphabetic), so the IPv4 pass redacts the
    // host part — the identifying bytes still never survive
    val Seq((e, i, _, red)) = scrub("ping a@10.0.0.1 now")
    assert(e === 0 && i === 1)
    assert(red === "ping a@<IP> now")
  }
}
