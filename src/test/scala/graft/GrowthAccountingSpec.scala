package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GrowthAccounting

/** Growth accounting: planted lifecycle classification (incl. the
  * permanent-lapse churn row), the ledger balance identity on the gate
  * stream, and the one-window plan shape.
  */
class GrowthAccountingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("user_id", "s").withColumn("ts", col("s").cast("timestamp"))
  }

  test("planted: new/retained/resurrected/churned, permanent lapse included") {
    // d0=2024-01-01 (epoch day 19723)
    // u1: d0, d1, d3       → new@d0, retained@d1, churn@d2, resurrected@d3, churn@d4
    // u2: d0 only          → new@d0, churn@d1 (permanent lapse)
    val out = GrowthAccounting.growthAccountingQ(ev(Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (1L, "2024-01-04 10:00:00"),
      (2L, "2024-01-01 12:00:00")))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val d0 = 19723L
    assert(out.toSeq == Seq(
      (d0, 2L, 2L, 0L, 0L, 0L),
      (d0 + 1, 1L, 0L, 1L, 0L, 1L),   // u1 retained; u2 churns
      (d0 + 2, 0L, 0L, 0L, 0L, 1L),   // u1's gap starts
      (d0 + 3, 1L, 0L, 0L, 1L, 0L),   // u1 resurrects
      (d0 + 4, 0L, 0L, 0L, 0L, 1L)))  // u1's open tail churns
  }

  test("gate: every day is classified exhaustively and the ledger balances") {
    val out = GrowthAccounting.growthAccountingQ(Tables.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // partition identity: every active user is exactly one class
    out.foreach { r => assert(r._2 == r._3 + r._4 + r._5, s"partition broke: $r") }
    // ledger identity on consecutive days: dau(d) = dau(d-1) + new + res - churn
    val byDay = out.map(r => r._1 -> r).toMap
    out.foreach { r =>
      byDay.get(r._1 - 1).foreach { prev =>
        assert(r._2 == prev._2 + r._3 + r._5 - r._6,
          s"ledger broke at ${r._1}: $prev -> $r")
      }
    }
    // the stream has churn somewhere (non-vacuous)
    assert(out.map(_._6).sum > 0)
  }

  test("plan: both rollups read the one checkpointed lag/lead stream — no rescan") {
    val plan = GrowthAccounting.growthAccountingQ(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    // the raw stream is materialized once behind the checkpoint; neither
    // the activity nor the churn branch re-runs the scan+window pipeline
    assert(!plan.contains("Scan parquet"), plan.take(1000))
    assert(!plan.contains("Window"), plan.take(1000))
  }
}
