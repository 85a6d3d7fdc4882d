package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Pins the extraction pipeline on crafted markup: script/style/comment
  * content dropped whole, tags stripped with content kept, entity decode
  * incl. the double-escape order, whitespace collapse, title pull,
  * link count, and the no-shuffle plan shape.
  */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(html: String): (String, String, Long) = {
    val df = Seq((1L, html)).toDF("id", "html")
    val r = HtmlExtract.extract(df, "html", Seq("id")).collect()(0)
    (Option(r.getString(1)).orNull, r.getString(2), r.getInt(3).toLong)
  }

  test("script, style, and comment CONTENT is dropped, element text kept") {
    val (_, text, _) = run(
      """<html><head><style>p { color: red }</style>
        |<script type="text/js">var a = "<p>not text</p>";</script></head>
        |<body><p>real   text</p><!-- hidden --><div>more</div></body></html>"""
        .stripMargin)
    assert(text === "real text more")
  }

  test("entities decode after tag strip, &amp; last (double-escape safe)") {
    val (_, text, _) = run("<p>A &amp; B &lt;tag&gt; &quot;q&quot; &apos;a&apos; &amp;lt;</p>")
    assert(text === "A & B <tag> \"q\" 'a' &lt;")
  }

  test("title extracted and cleaned; absent title is null") {
    val (t1, _, _) = run("<html><head><title> My&amp;Page\n  2 </title></head><body>x</body></html>")
    assert(t1 === "My&Page 2")
    val (t2, _, _) = run("<body>no title</body>")
    assert(t2 === null)
  }

  test("anchor count is case-insensitive and ignores non-anchor tags") {
    val (_, _, n) = run("""<a href="x">l1</a><A HREF="y">l2</A><abbr>not</abbr><a>bare</a>""")
    assert(n === 3L)
  }

  test("multiline script spans are removed (dotall)") {
    val (_, text, _) = run("<script>\nline1\nline2\n</script><p>kept</p>")
    assert(text === "kept")
  }

  test("plan: pure projection, no Exchange, no UDF") {
    val df = Seq((1L, "<p>x</p>")).toDF("id", "html")
    val plan = HtmlExtract.extract(df, "html", Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      plan.take(1500))
  }
}
