package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HtmlClean

/** HTML stripping: exact cleaned text for every planted case (tags,
  * entity decode order, multiline/case-insensitive blocks, the quoted-'>'
  * limitation), the mass gate, and the zero-exchange map plan.
  */
class HtmlCleanSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val out = HtmlClean.htmlCleanQ(spark).collect()
    .map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
    .toMap

  test("tags strip to spaces, entities decode in pinned order") {
    assert(out(1L)._1 ==
      "Title Here First & second <tags> stay readable text in the body.")
    assert(out(4L)._1 ==
      "Ben &amp; Jerry say \"hello\" and 'goodbye' with a non-breaking space inside this plain sentence.",
      "&amp; decodes LAST: double-encoded &amp;amp; surfaces as literal &amp;")
  }

  test("script/style/comment blocks drop wholesale, (?is) flags work") {
    assert(out(2L)._1 == "Real content survives the block removal pass.")
    assert(out(3L)._1 ==
      "Home Body text follows the stripped comment and keeps enough length.")
    assert(out(5L)._1 ==
      "Only this sentence should remain from the multiline script document.")
    assert(out(6L)._1 ==
      "Uppercase tags are removed case-insensitively like lowercase ones.")
  }

  test("mass gate: boilerplate-only, NULL, and tiny docs rejected") {
    assert(out(7L) == (("", 52L, 0L, 0.0, false)))
    assert(out(9L) == (("", 0L, 0L, 0.0, false)))
    assert(out(10L)._1 == "tiny bit")
    assert(!out(10L)._5, "8 clean chars < MinChars")
    assert(out(8L)._4 == 1.0 && out(8L)._5, "plain prose passes untouched")
  }

  test("quoted '>' inside an attribute ends the tag match early (pinned limitation)") {
    assert(out(11L)._1 ==
      "here\">link plus trailing prose to make this document long enough.")
  }

  test("plan: pure map pass, zero exchanges before the output sort") {
    import spark.implicits._
    val docs = Seq((1L, "<p>x</p>")).toDF("doc_id", "text")
    val p = HtmlClean.htmlClean(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"expected a fused map-only plan:\n$p")
  }
}
