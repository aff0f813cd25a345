package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retention, ZOrder}

class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf)

  test("morton arithmetic interleaves bits exactly") {
    // morton(x, y) places x's bit i at position 2i, y's at 2i+1
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (12345L, 54321L))
    def ref(x: Long, y: Long): Long =
      (0 until ZOrder.DimBits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val m = ZOrder.mortonExpr("x", "y", "div")
    val got = cases.toDF("x", "y").withColumn("m", expr(m))
      .collect().map(_.getLong(2))
    assert(got.toSeq == cases.map { case (x, y) => ref(x, y) })
    assert(ref(3L, 5L) == 39L) // hand-checked: 1 + 2 + 4 + 32
  }

  test("gate events: buckets bound BOTH dims — user span beats a time layout") {
    val plan = ZOrder.zorderPlanQ(events).collect()
    assert(plan.nonEmpty && plan.length <= (1 << ZOrder.BucketBits))
    val base = events.select(col("user_id"),
      expr(s"unix_micros(ts) div ${Retention.UsPerDay}").as("day"))
    val g = base.agg(min("user_id"), max("user_id")).head()
    val globalUserSpan = g.getLong(1) - g.getLong(0)
    // a time-sorted layout's files each span ~the whole user range;
    // z-order buckets must do strictly better on average
    val meanSpan = plan.map(r => r.getLong(3) - r.getLong(2)).sum.toDouble / plan.length
    assert(meanSpan < globalUserSpan * 0.75,
      s"mean bucket user span $meanSpan vs global $globalUserSpan — no clustering win")
    // bucket row counts must cover the table exactly
    assert(plan.map(_.getLong(1)).sum == events.count())
  }

  test("plan: stats row broadcast, bucket agg the only data-scaled exchange") {
    val p = ZOrder.zorderPlanQ(events).queryExecution.executedPlan.toString
    // the 1-row stats frame joins via broadcast nested loop — the
    // documented broadcast-fact class (ref_integrity precedent)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
    // shuffles: stats single-partition agg + bucket agg + final sort
    val shuffles = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(p).length
    assert(shuffles <= 3, s"unexpected shuffles:\n$p")
  }
}
