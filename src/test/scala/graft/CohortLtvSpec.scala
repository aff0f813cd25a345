package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CohortLtv, Retention}

/** Cohort LTV: planted cumulative-cell semantics (pre-signup and
  * post-horizon spend excluded, non-signup users absent), a full Scala
  * recount on the gate stream, and cohort-size agreement with the
  * shipped retention matrix.
  */
class CohortLtvSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(rows: Seq[(Long, String, String, Double)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("user_id", "event_type", "s", "value")
      .withColumn("ts", col("s").cast("timestamp"))
  }

  test("planted: cumulative cells, windows and exclusions") {
    // user 1 signs up day 0 (epoch 2024-01-01): spends 1.00 on d0 (signup
    // row itself), 2.00 on d1, 4.00 on d5, 8.00 on d14, 99 on d20 (outside)
    // user 2 never signs up — excluded entirely
    // user 3 signs up d2, spent 50 on d1 (PRE-signup — excluded)
    val out = CohortLtv.cohortLtvQ(ev(Seq(
      (1L, "signup", "2024-01-01 00:00:00", 1.0),
      (1L, "purchase", "2024-01-02 00:00:00", 2.0),
      (1L, "purchase", "2024-01-06 00:00:00", 4.0),
      (1L, "purchase", "2024-01-15 00:00:00", 8.0),
      (1L, "purchase", "2024-01-21 00:00:00", 99.0),
      (2L, "purchase", "2024-01-01 00:00:00", 77.0),
      (3L, "purchase", "2024-01-02 00:00:00", 50.0),
      (3L, "signup", "2024-01-03 00:00:00", 1.0)))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val d0 = 19723L // 2024-01-01 epoch day
    assert(out.toSeq == Seq(
      (d0, 1L, 100L, 300L, 300L, 700L, 1500L, 1500L),
      (d0 + 2, 1L, 100L, 100L, 100L, 100L, 100L, 100L)))
  }

  test("gate: full Scala recount + cohort sizes agree with event_retention") {
    val evt = Tables.events(spark, sf)
    val rows = evt.selectExpr("user_id", "event_type",
      s"unix_micros(ts) div ${Retention.UsPerDay}",
      "CAST(round(value * 100.0) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cohorts = rows.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val expected = cohorts.groupBy(_._2).toSeq.sortBy(_._1).map { case (cd, us) =>
      val users = us.map(_._1).toSet
      def cum(k: Int) = rows.filter(r => users.contains(r._1) &&
        cohorts(r._1) == cd && r._3 - cd >= 0 && r._3 - cd <= k).map(_._4).sum
      val n = users.size.toLong
      (cd, n, cum(0), cum(1), cum(3), cum(7), cum(14), cum(14) / n)
    }
    val out = CohortLtv.cohortLtvQ(evt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(out == expected)
    val ret = Retention.eventRetentionQ(evt).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r => assert(ret(r._1) == r._2, s"cohort size mismatch at ${r._1}") }
  }
}
