package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PiiRedact

/** PII detect + redact over the committed fixture: per-class counts,
  * placeholder substitution, the near-miss cases (version strings, "at"
  * spelled out), NULL/empty totality, map-only plan.
  */
class PiiRedactSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val out = PiiRedact.piiRedactQ(spark).collect()
    .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
      r.getBoolean(4), r.getString(5)))
    .toMap

  test("counts per class; multi-hit docs; clean docs score zero") {
    assert(out(1L)._1 == 1 && out(1L)._4)
    assert(out(2L)._2 == 2, "two IPv4 literals in doc 2")
    assert(out(3L) == ((1, 0, 1, true, "call [PHONE] or mail [EMAIL] about pricing")))
    assert(out(4L) == ((0, 0, 0, false,
      "a perfectly clean document about spark query planning and shuffles")))
    assert(out(5L)._1 == 2, "two distinct emails in doc 5")
    assert(out(6L)._3 == 1 && out(6L)._5 == "dial [PHONE] from the office landline")
  }

  test("near misses stay untouched: version strings and spelled-out addresses") {
    // "1.2" / "3.4" are not IPv4 (word-bounded 4-octet form only), but the
    // full dotted quad in the same sentence is
    assert(out(7L)._2 == 1 && out(7L)._5.contains("versions 1.2 and 3.4"))
    assert(out(7L)._5.contains("[IP] is a host"))
    // "alice at example dot com" has no @ — nothing to redact
    assert(out(8L) == ((0, 0, 0, false,
      "no addresses here just the at sign used as in alice at example dot com")))
  }

  test("redaction replaces ALL occurrences and placeholders never cascade") {
    assert(out(2L)._5 == "the server at [IP] responded before [IP] timed out")
    assert(out(5L)._5 == "reach [EMAIL] and backup [EMAIL] today")
  }

  test("NULL/empty text is total; plan is a pure map pass") {
    import spark.implicits._
    val d = Seq((1L, null), (2L, "")).toDF("doc_id", "text")
    val rows = PiiRedact.piiRedact(d).collect()
    assert(rows.length == 2, "every doc emits a row")
    val p = PiiRedact.piiRedactQ(spark).queryExecution.executedPlan.toString
    // the final orderBy is the only exchange
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"pii_redact must be map-only up to the output sort:\n$p")
  }
}
