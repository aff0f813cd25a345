package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ActivityStreaks, AudienceOverlap}

/** Audience overlap + activity streaks: planted set arithmetic /
  * islands, full Scala recounts on the gate stream, and the
  * catalog-bounded pair shape.
  */
class AudienceStreaksSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("user_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp"))
  }

  test("audience_overlap planted: set sizes, common users, jaccard") {
    // click users {1,2,3}, view users {2,3}, buy users {9}
    val out = AudienceOverlap.audienceOverlapQ(ev(Seq(
      (1L, "click", "2024-01-01 00:00:00"), (2L, "click", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-01 00:00:00"), (2L, "view", "2024-01-01 00:00:00"),
      (3L, "view", "2024-01-01 00:00:00"), (2L, "view", "2024-01-02 00:00:00"),
      (9L, "buy", "2024-01-01 00:00:00")))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // buy shares no users → no pair rows with buy
    assert(out.toSeq == Seq(("click", "view", 3L, 2L, 2L, 666666L)))
  }

  test("audience_overlap gate: full Scala recount of the pair matrix") {
    val rows = Tables.events(spark, sf).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).distinct
    val byType = rows.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.size
      t1 = types(i); t2 = types(j)
      common = (byType(t1) & byType(t2)).size.toLong if common > 0
    } yield (t1, t2, byType(t1).size.toLong, byType(t2).size.toLong, common,
      common * 1000000L / (byType(t1).size + byType(t2).size - common))).toSeq
    val out = AudienceOverlap.audienceOverlapQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == expected)
  }

  test("activity_streaks planted: islands, tie-once personal bests") {
    // u1 days 1,2,3 then 7,8 → streaks 3 and 2; best 3
    // u2 days 1 and 3 → two streaks of 1; best 1 (counted ONCE)
    def d(n: Int) = f"2024-01-$n%02d 05:00:00"
    val out = ActivityStreaks.activityStreaksQ(ev(Seq(
      (1L, "c", d(1)), (1L, "c", d(2)), (1L, "c", d(3)), (1L, "c", d(7)),
      (1L, "c", d(8)),
      (2L, "c", d(1)), (2L, "c", d(3))))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 1L),   // two 1-day streaks, all u2's; u2's best
      (2L, 1L, 1L, 0L),   // u1's 2-day streak is not a best
      (3L, 1L, 1L, 1L)))  // u1's best
  }

  test("activity_streaks gate: recount from plain Scala islands") {
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", s"unix_micros(ts) div ${graft.operators.Retention.UsPerDay}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val runs = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val days = rs.map(_._2).sorted
      days.zipWithIndex.groupBy { case (d, i) => d - i }
        .toSeq.map { case (_, g) => (u, g.size.toLong) }
    }
    val best = runs.groupBy(_._1).map { case (u, gs) => u -> gs.map(_._2).max }
    val expected = runs.groupBy(_._2).toSeq.sortBy(_._1).map { case (len, gs) =>
      (len, gs.size.toLong, gs.map(_._1).distinct.size.toLong,
        best.count(_._2 == len).toLong)
    }
    val out = ActivityStreaks.activityStreaksQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == expected)
  }
}
