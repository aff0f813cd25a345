package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LineFilter

/** line_filter: exact Scala-side recomputation of every gate over the
  * committed fixture, the planted boilerplate/short/unterminated traps,
  * and the zero-exchange map-pass plan shape.
  */
class LineFilterSpec extends AnyFunSuite {
  import SparkTestSession._

  private def keepLine(l: String): Boolean = {
    val t = l.trim
    val lower = l.toLowerCase
    t.split("\\s+").length >= LineFilter.MinLineWords &&
      t.nonEmpty && Set('.', '!', '?', '"').contains(t.last) &&
      !LineFilter.BoilerplatePhrases.exists(lower.contains)
  }

  private lazy val out = LineFilter.lineFilterQ(spark).collect()
    .map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4), r.getString(5)))
    .toMap

  test("line_filter: every gate recomputes exactly over the fixture") {
    val raw = spark.read
      .schema("doc_id LONG, text STRING")
      .json(s"${LineFilter.FixtureDir}/*.jsonl")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    assert(raw.length == out.size && raw.nonEmpty)
    raw.foreach { case (id, text) =>
      val lines = text.split("\n", -1).toSeq
      val kept = lines.filter(keepLine)
      val ratio = math.round(kept.length.toDouble / lines.length * 10000.0) / 10000.0
      val (gLines, gKept, gRatio, gKeep, gCleaned) = out(id)
      assert(gLines == lines.length, s"doc $id n_lines")
      assert(gKept == kept.length, s"doc $id n_kept")
      assert(gRatio == ratio, s"doc $id kept_ratio")
      assert(gKeep == (kept.length >= LineFilter.MinKeptLines), s"doc $id keep")
      assert(gCleaned == kept.mkString("\n"), s"doc $id cleaned text")
    }
  }

  test("line_filter: planted traps fire — boilerplate, short, unterminated, quote, null") {
    // doc 3: the cookie-banner line is dropped even though it has words +
    // terminal punctuation; the two prose lines survive
    assert(out(3L)._2 == 2 && out(3L)._4 && !out(3L)._5.toLowerCase.contains("cookie"))
    // doc 5: both lorem-ipsum lines die; one survivor is below MinKeptLines
    assert(out(5L)._2 == 1 && !out(5L)._4)
    // doc 7: a line ending in a double-quote passes the terminal rule
    assert(out(7L)._5.linesIterator.next().endsWith("\""))
    // doc 9: single good line, but below the doc gate
    assert(out(9L)._1 == 1 && out(9L)._2 == 1 && !out(9L)._4)
    // doc 11: NULL text → one empty line, nothing kept, empty cleaned text
    assert(out(11L) == ((1, 0, 0.0, false, "")))
    // doc 12: indented line is kept with its original spacing; the 2-word
    // punctuated line and the unterminated lines are dropped
    val d12 = out(12L)._5.linesIterator.toSeq
    assert(d12.head.startsWith("   ") && d12.head.trim.endsWith("."))
    assert(!out(12L)._5.contains("Short one") && !out(12L)._5.contains("never terminates"))
    assert(d12.exists(_.endsWith("!")) && d12.exists(_.endsWith("?")))
  }

  test("line_filter: pure map pass — no exchange before the output sort") {
    val p = LineFilter.lineFilterQ(spark).queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"line_filter must not shuffle before the output sort:\n$p")
  }
}
