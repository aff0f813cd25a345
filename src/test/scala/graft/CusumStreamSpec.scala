package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cusum
import graft.streaming.StreamingJobs

/** The streaming CUSUM twin: per-type daily counts fold in keyed state,
  * each day's row emits EXACTLY ONCE when the watermark passes it, and
  * the drained replay equals the batch operator row-for-row over the
  * batch span — with the baseline μ derived stream-statically FROM the
  * batch operator (the refresh contract). Trailing silence past the
  * span keeps emitting real zero days (monitoring semantics — the
  * stated divergence from the batch span convention), and a row
  * arriving below an already-closed day is dropped without disturbing
  * the emitted history. */
class CusumStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private val UsPerDay = 86400000000L
  private val B = 100L // day base — keeps the wm=0 bootstrap far away

  /** The CusumSpec drift series for type a (10/day × 20 then 100/day
    * × 10, days B..B+29: μ = 40000 milli, alarm exactly days B+25..29)
    * plus a 2-day series for type b (the late-drop probe). */
  private def dayEvents(tpe: String, day: Long, n: Long): Seq[(Long, Long, String)] =
    (0L until n).map(i => (day * 100000 + i, day * UsPerDay + i * 1000L, tpe))

  private val aSeries: Seq[(Long, Long, String)] =
    (0 until 20).flatMap(d => dayEvents("a", B + d, 10)) ++
      (20 until 30).flatMap(d => dayEvents("a", B + d, 100))
  private val bSeries: Seq[(Long, Long, String)] =
    dayEvents("b", B, 3) ++ dayEvents("b", B + 1, 5)

  /** Arrival chunks, event-time ordered; two sentinel chunks of type zz
    * drive the global watermark far past the fixtures so every fixture
    * day closes during a real data batch. The LATE row (type b, day B —
    * long closed by then) rides in with the final sentinel. */
  private val chunks: Seq[Seq[(Long, Long, String)]] = Seq(
    (aSeries ++ bSeries).filter(_._2 < (B + 15) * UsPerDay),
    aSeries.filter(e => e._2 >= (B + 15) * UsPerDay && e._2 < (B + 25) * UsPerDay),
    aSeries.filter(_._2 >= (B + 25) * UsPerDay),
    dayEvents("zz", B + 200, 1),
    dayEvents("zz", B + 300, 1) ++ dayEvents("b", B, 1) /* late: dropped */)

  private def replay(mu: Map[String, Long]): Seq[(String, Long, Long, Long, Int)] = {
    val src = Files.createTempDirectory("graft-cusum-src").toString
    val out = Files.createTempDirectory("graft-cusum-out").toString
    val ckpt = Files.createTempDirectory("graft-cusum-ckpt").toString
    chunks.foreach { c =>
      val rows = c.map { case (id, tUs, tpe) =>
        Row(id, tUs * 1000L, 1L, tpe, 1.0: java.lang.Double, "{}")
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StreamingJobs.eventsRawSchema(tsIsLong = true))
        .write.mode("append").parquet(src)
      val q = StreamingJobs.cusumStream(spark, src, "3600 seconds", mu)
        .toDF().writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    spark.read.parquet(out)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("drained replay equals the batch twin over the span; tail zeros decay; late row dropped") {
    // stream-static μ: derived from the batch operator over the static
    // snapshot — exactly what a deployment does at query (re)start
    def batchFor(tpe: String) = {
      val evs = (aSeries ++ bSeries).filter(_._3 == tpe)
      import spark.implicits._
      Cusum.cusumAlarm(
        evs.toDF("event_id", "t_us", "event_type")
          .withColumn("ts", expr("timestamp_micros(t_us)")))
    }
    val aBatch = batchFor("a").orderBy("day").collect()
      .map(r => ("a", r.getLong(1), r.getLong(2), r.getLong(4), r.getInt(5)))
    val muA = batchFor("a").select("mu_milli").head.getLong(0)
    val muB = batchFor("b").select("mu_milli").head.getLong(0)
    assert(muA == 40000L, s"fixture drifted: $muA")

    val got = replay(Map("a" -> muA, "b" -> muB))
    // 1. parity over the batch span — row-for-row, including the alarm
    //    days B+25..B+29
    val aGot = got.filter(t => t._1 == "a" && t._2 <= B + 29)
    assert(aGot == aBatch.toSeq, s"stream diverged from batch:\n$aGot\nvs\n${aBatch.toSeq}")
    assert(aGot.count(_._5 == 1) == 5)
    // 2. trailing silence: zero days keep emitting and S decays to 0
    val aTail = got.filter(t => t._1 == "a" && t._2 > B + 29)
    assert(aTail.nonEmpty && aTail.forall(_._3 == 0L), "tail must be real zero days")
    assert(aTail.last._4 == 0L, s"S must decay to 0 over silence: ${aTail.last}")
    // the alarm rightly PERSISTS while S decays through the gate
    // (400000 − 60000/day crosses 200000 after ~3 silent days), then
    // stays off — a contiguous prefix, never a re-fire
    assert(aTail.dropWhile(_._5 == 1).forall(_._5 == 0),
      s"alarm must be a decay prefix: ${aTail.take(8)}")
    // 3. the late b row (day B, arriving after day B closed) was DROPPED:
    //    day B's emitted count is the original 3, emitted exactly once
    val bDayB = got.filter(t => t._1 == "b" && t._2 == B)
    assert(bDayB == Seq(("b", B, 3L, bDayB.head._4, bDayB.head._5)),
      s"late row must not disturb the closed day: $bDayB")
  }
}
