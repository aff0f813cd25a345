package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LateArrival
import graft.streaming.StreamingJobs

/** LEFT-OUTER stream-stream range join (round 12): matched pairs emit on
  * arrival (the inner contract), a purchase's NULL-click row emits
  * EXACTLY when the global watermark passes its purch_ts — before that,
  * "no match" is still "no match yet". Both directions pinned on a
  * planted replay (no-data micro-batches disabled so each chunk is one
  * deterministic batch using the PREVIOUS batch's watermark), plus full
  * batch LEFT JOIN parity on the drained gate replay. */
class StreamStreamOuterSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeChunk(src: String, rows: Seq[Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StreamingJobs.eventsRawSchema(tsIsLong = true))
      .write.mode("append").parquet(src)

  private def runPass(src: String, out: String, ckpt: String,
                      delay: String): Unit = {
    val q = StreamingJobs.clickPurchaseOuterJoinStream(spark, src, delay)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  private type OPair = (Long, Long, Option[Long], Long, Option[Long])
  private def outRows(path: String): Set[OPair] = {
    val dir = new java.io.File(path)
    if (!dir.exists() || !dir.listFiles().exists(_.getName.endsWith(".parquet")))
      return Set.empty
    spark.read.parquet(path)
      .select("user_id", "purch_id", "click_id", "purch_us", "click_us")
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))
      }.toSet
  }

  // event row: (event_id, ts_ns, user_id, event_type, value, props)
  private def ev(id: Long, tSec: Long, user: Long, tpe: String): Row =
    Row(id, tSec * 1000000000L, user, tpe, 1.0: java.lang.Double, "{}")

  test("NULL row is withheld until the watermark passes, then emits; matches emit on arrival") {
    val noData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val src = Files.createTempDirectory("graft-sso-src").toString
      val out = Files.createTempDirectory("graft-sso-out").toString
      val ckpt = Files.createTempDirectory("graft-sso-ckpt").toString
      val delay = "10 seconds"

      // chunk 1: matched pair (c1@100s → p2@120s, user 1) + unmatched
      // purchase p1@150s (user 2, no clicks). Batch 1 runs with wm=0.
      writeChunk(src, Seq(
        ev(101, 100, 1, "click"), ev(201, 120, 1, "purchase"),
        ev(202, 150, 2, "purchase")))
      runPass(src, out, ckpt, delay)
      val after1 = outRows(out)
      assert(after1 == Set((1L, 201L, Some(101L), 120000000L, Some(100000000L))),
        s"batch 1 must emit exactly the matched pair, no NULLs yet: $after1")

      // chunk 2: sentinels at 400s on BOTH streams (users 98/99 never
      // match). Batch 2 still uses batch 1's watermark (150−10=140s <
      // 150s) — p1's NULL row must STILL be withheld.
      writeChunk(src, Seq(ev(301, 400, 99, "click"), ev(302, 400, 98, "purchase")))
      runPass(src, out, ckpt, delay)
      val after2 = outRows(out)
      assert(after2 == after1,
        s"watermark (140s) has not passed purch_ts (150s) — NULL row emitted early: ${after2 -- after1}")

      // chunk 3: sentinels at 500s. Batch 3 uses wm=390s > 150s — p1's
      // NULL row emits NOW; the 400s sentinel purchase (wm < 400s) is
      // still withheld. Emission exactly at watermark passage, both ways.
      writeChunk(src, Seq(ev(303, 500, 97, "click"), ev(304, 500, 96, "purchase")))
      runPass(src, out, ckpt, delay)
      val after3 = outRows(out)
      assert(after3 -- after2 == Set((2L, 202L, None, 150000000L, None)),
        s"expected exactly p1's NULL row after watermark passage: ${after3 -- after2}")
    } finally {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData)
    }
  }

  test("drained outer stream equals the batch LEFT JOIN exactly at gate") {
    val noData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val events = Tables.events(spark, sf)
      val delaySec = LateArrival.globalLateness(events).collect()
        .map(_.getAs[Long]("max_behind_us")).max / 1000000 + 1
      val src = Files.createTempDirectory("graft-sso2-src").toString
      val out = Files.createTempDirectory("graft-sso2-out").toString
      val ckpt = Files.createTempDirectory("graft-sso2-ckpt").toString
      val ordered = events.orderBy("event_id")
        .select(col("event_id"), unix_micros(col("ts")).as("t_us"),
          col("user_id"), col("event_type"), col("value"))
        .collect()
      val maxSec = ordered.map(_.getLong(1)).max / 1000000
      ordered.grouped(math.max(ordered.length / 4, 1)).foreach { c =>
        val rows = c.map(r => Row(r.getLong(0), r.getLong(1) * 1000L, r.getLong(2),
          r.getString(3), r.getAs[java.lang.Double](4), "{}"))
        writeChunk(src, rows.toSeq)
        runPass(src, out, ckpt, s"$delaySec seconds")
      }
      // two sentinel passes advance the watermark past every real
      // purchase (sentinel users are negative — excluded below; each
      // sentinel purchase's own NULL row drains on the NEXT pass)
      Seq(2L, 3L).foreach { d =>
        val t = maxSec + d * 86400L
        writeChunk(src, Seq(
          ev(-d * 2, t, -7 - d, "click"), ev(-d * 2 - 1, t, -17 - d, "purchase")))
        runPass(src, out, ckpt, s"$delaySec seconds")
      }
      val streamed = outRows(out).filter(_._1 >= 0)
      val batch = StreamingJobs.batchClickPurchaseOuterPairs(events)
        .collect().map { r =>
          (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getLong(4)))
        }.toSet
      val nulls = batch.count(_._3.isEmpty)
      assert(nulls > 0 && batch.size > nulls,
        s"gate fixture vacuous: $nulls NULL rows of ${batch.size}")
      assert(streamed == batch,
        s"outer stream diverged: missing=${(batch -- streamed).take(3)} " +
          s"extra=${(streamed -- batch).take(3)}")
    } finally {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData)
    }
  }
}
