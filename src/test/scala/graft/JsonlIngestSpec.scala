package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JsonlIngest

/** JSONL ingest (round 7): the fixture plants one syntactically-invalid
  * line and one record missing the required `text` field; the clean frame
  * must drop exactly those two (by different paths), the corrupt audit
  * must surface exactly the broken line, and the plan must stay map-only
  * with no schema-inference pre-pass.
  */
class JsonlIngestSpec extends AnyFunSuite {
  import SparkTestSession._

  test("clean ingest drops exactly the broken line and the missing-text record") {
    val rows = JsonlIngest.jsonlIngest(spark, JsonlIngest.FixtureDir).collect()
    assert(rows.length == 27, s"fixture has 27 valid docs, got ${rows.length}")
    val ids = rows.map(_.getAs[Long]("doc_id")).sorted
    assert(ids.sameElements(0L until 27L), "planted dirty ids (900/901) must not survive")
    rows.foreach { r =>
      assert(r.getAs[String]("text") != null && r.getAs[Int]("n_chars") > 0)
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"nested meta.quality out of range: $q")
      assert(r.getAs[String]("origin").startsWith("crawl-"))
    }
  }

  test("corrupt audit surfaces exactly the syntactically-broken line, no materialization") {
    val corrupt = JsonlIngest.jsonlCorrupt(spark, JsonlIngest.FixtureDir).collect()
    assert(corrupt.length == 1, s"expected 1 corrupt line, got ${corrupt.length}")
    assert(corrupt.head.getAs[String]("raw_line").contains("unterminated"))
    // a plain filtered scan — the audit must not checkpoint/cache the
    // parsed corpus to dodge the corrupt-column-only restriction
    val p = JsonlIngest.jsonlCorrupt(spark, JsonlIngest.FixtureDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("Scan json") && !p.contains("Scan ExistingRDD"),
      s"corrupt audit should read the scan directly:\n$p")
  }

  test("plan is map-only with a single scan — no shuffle, no inference pre-pass") {
    val p = JsonlIngest.jsonlIngest(spark, JsonlIngest.FixtureDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"jsonl ingest must not shuffle:\n$p")
    assert(p.linesIterator.count(_.contains("Scan json")) == 1,
      s"explicit schema means exactly one json scan:\n$p")
  }
}
