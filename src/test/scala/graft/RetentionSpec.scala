package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retention

/** Cohort retention: planted cohort algebra (pre-signup activity doesn't
  * create a cohort row; multi-signup keeps the first; same-day repeats
  * count once) and a full Scala recount of the gate matrix.
  */
class RetentionSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  private def df(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, et, day), i) =>
      (i.toLong, new Timestamp(day * 86400L * 1000L + 3600L * 1000L), u, et, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("planted: cohort day = first signup; same-day repeats count once; no-signup user invisible") {
    val rows = Seq[(Long, String, Long)](
      // u1 signs up day 10, active days 10, 11 (twice), 17
      (1L, "signup", 10), (1L, "view", 10), (1L, "click", 11),
      (1L, "view", 11), (1L, "view", 17),
      // u2 signs up day 10 AND day 13 (first wins), active day 13 (offset 3)
      (2L, "signup", 10), (2L, "signup", 13),
      // u3 never signs up — activity must not appear anywhere
      (3L, "view", 10), (3L, "view", 11),
      // u4 signs up day 12, was active BEFORE signup (day 9: negative offset
      // dropped), active day 13
      (4L, "view", 9), (4L, "signup", 12), (4L, "click", 13))
    val out = Retention.eventRetentionQ(df(rows)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // cohort 10: u1, u2. d0: both (signup day itself). d1: u1. d3: u2 (day 13). d7: u1 (day 17). d14: none
    assert(out(10L) == ((2L, 2L, 1L, 1L, 1L, 0L)), s"cohort 10 ${out(10L)}")
    // cohort 12: u4. d0: signup day. d1: day 13
    assert(out(12L) == ((1L, 1L, 1L, 0L, 0L, 0L)), s"cohort 12 ${out(12L)}")
    assert(out.keySet == Set(10L, 12L), "unexpected cohort rows")
  }

  test("gate corpus: full Scala recount of the retention matrix") {
    val evs = events.select(col("user_id"), col("event_type"),
      expr(s"unix_micros(ts) div ${Retention.UsPerDay}").as("day")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val cohorts = evs.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val activity = evs.map(e => (e._1, e._3)).distinct
    val expected = cohorts.values.toSeq.distinct.sorted.map { cd =>
      val members = cohorts.filter(_._2 == cd).keySet
      val counts = Retention.Offsets.map { k =>
        activity.count { case (u, d) => members(u) && d == cd + k }.toLong
      }
      cd -> ((members.size.toLong, counts))
    }.toMap
    val out = Retention.eventRetentionQ(events).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Retention.Offsets.indices.map(i => r.getLong(2 + i)).toList))
      .toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (cd, (n, counts)) =>
      assert(out(cd) == ((n, counts)), s"cohort $cd: ${out(cd)} != ($n, $counts)")
    }
    // d0 equals cohort size by construction (signup day is an active day)
    out.foreach { case (cd, (n, counts)) =>
      assert(counts.head == n, s"cohort $cd d0 ${counts.head} != size $n")
    }
  }
}
