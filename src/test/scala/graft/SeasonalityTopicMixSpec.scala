package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Seasonality, TopicClassify, TopicMix}

/** Seasonality fold + topic mixture matrix, recounted in plain Scala.
  */
class SeasonalityTopicMixSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)
  private lazy val docs = Tables.documents(spark, sf)

  test("seasonality planted: weekday shift and hour fold are exact") {
    import spark.implicits._
    // 2024-01-01 was a Monday → dow 0; 23:30 → hour 23
    val df = Seq(
      (1L, "2024-01-01 23:30:00", 1L, 1.00),
      (2L, "2024-01-07 00:15:00", 1L, 2.00),  // Sunday → dow 6, hour 0
      (3L, "2024-01-01 23:59:59", 2L, 0.50))
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Seasonality.eventSeasonalityQ(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out((0L, 23L)) == ((2L, 150L, 666666L)))
    assert(out((6L, 0L)) == ((1L, 200L, 333333L)))
    assert(out.size == 2)
  }

  test("seasonality gate: matrix recomputes from a plain Scala fold") {
    val rows = events.select(expr("unix_micros(ts)"),
      expr("CAST(round(value * 100.0) AS BIGINT)")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cells = rows.groupBy { case (us, _) =>
      ((us / 86400000000L + 3) % 7, (us % 86400000000L) / 3600000000L)
    }.map { case (k, v) => k -> ((v.length.toLong, v.map(_._2).sum)) }
    val total = rows.length.toLong
    val expected = cells.map { case (k, (n, c)) =>
      k -> ((n, c, n * 1000000L / total))
    }
    val out = Seasonality.eventSeasonalityQ(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out == expected)
  }

  test("topic mix gate: cells recompute from the labeler; sources sum to 1e6-ish") {
    val labels = TopicClassify.topicClassifyQ(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
    val cells = rows.groupBy(r => (r._2, labels(r._1))).map { case (k, v) =>
      k -> ((v.length.toLong,
        v.map(_._3.toLowerCase.trim.split("\\s+").count(_.nonEmpty).toLong).sum))
    }
    val srcTot = cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.map(_._1).sum }
    val expected = cells.map { case ((s, t), (n, m)) =>
      (s, t) -> ((n, m, n * 1000000L / srcTot(s)))
    }
    val out = TopicMix.topicMixQ(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out == expected)
  }
}
