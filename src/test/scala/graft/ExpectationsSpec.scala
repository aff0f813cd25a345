package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations

/** expectations_report — one planted violation per rule, exact counts,
  * the one-scan plan shape, and clean-corpus identity. */
class ExpectationsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted fixture: every rule counts exactly its violations") {
    val fix = Seq(
      (Some(1L), Some("good text"), Some("en"), 9L),     // clean
      (None: Option[Long], Some("no id"), Some("en"), 5L), // null id (+unique)
      (Some(3L), None: Option[String], Some("en"), 0L),  // null text (3 text rules)
      (Some(4L), Some("   "), Some("en"), 3L),           // blank text
      (Some(5L), Some("len lies"), Some("en"), 99L),     // n_chars wrong
      (Some(6L), Some("no lang"), None: Option[String], 7L), // null lang
      (Some(7L), Some("dup id a"), Some("en"), 8L),
      (Some(7L), Some("dup id b"), Some("en"), 8L))      // duplicate id
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = Expectations.expectationsReport(fix).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("doc_id_not_null") == ((8L, 1L, 875000L)))
    assert(got("text_not_null")._2 == 1L)
    assert(got("text_nonempty")._2 == 2L)   // null text + blank text
    // null text, the wrong-length row, and... n_chars matches elsewhere:
    // 'good text'=9, 'no id'=5, '   '=3, 'no lang'=7, dups=8 — so 2
    assert(got("n_chars_consistent")._2 == 2L)
    assert(got("lang_known")._2 == 1L)
    // null-id row joins the dup pair: 8 rows, 6 distinct non-null ids
    assert(got("doc_id_unique")._2 == 2L)
  }

  test("gate corpus: internally consistent and ppm formula exact") {
    val rows = Expectations.expectationsReport(docs).collect()
    assert(rows.length == 6)
    val n = docs.count()
    rows.foreach { r =>
      assert(r.getLong(1) == n, s"${r.getString(0)}: n_rows drifted")
      val expectPpm = if (n == 0) 1000000L else (n - r.getLong(2)) * 1000000L / n
      assert(r.getLong(3) == expectPpm, s"${r.getString(0)}: ppm text drifted")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)
    }
  }

  test("empty corpus: the report says all-pass, not nothing (day-one gate semantics)") {
    // deliberately NOT in EmptyInputSpec's zero-row registry: an empty
    // batch VIOLATES no expectation, and the gate consumer reads the
    // report unconditionally — 6 rules, n_rows 0, pass_ppm 10^6
    val empty = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "lang", "n_chars")
    val rows = Expectations.expectationsReport(empty).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 1000000L)
    }
  }

  test("plan: one scan of documents, no join") {
    val plan = Expectations.expectationsReport(docs)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans")
    assert(!plan.contains("Join"), "expectations must not plan a join")
  }
}
