package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LateArrival
import graft.streaming.StreamingJobs

/** Round 13: the REMAINING stream-stream join contracts after inner
  * (StreamStreamJoinSpec) and left-outer (StreamStreamOuterSpec) —
  * FULL OUTER and LEFT SEMI.
  *
  * Full outer pins the per-side finalization asymmetry the range
  * condition induces: an unmatched purchase's NULL row finalizes at its
  * own purch_ts (top of the trailing window), but an unmatched click's
  * NULL row finalizes only at click_ts + window — the last instant a
  * purchase it could attribute to may still arrive, a full WINDOW
  * later. Left semi pins the existence contract: emit on FIRST match
  * arrival, exactly once, never for unmatched rows — no watermark
  * gating on the match path at all. Both drain to exact batch parity. */
class StreamStreamMatrixSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeChunk(src: String, rows: Seq[Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StreamingJobs.eventsRawSchema(tsIsLong = true))
      .write.mode("append").parquet(src)

  private def runPass(stream: DataFrame, out: String, ckpt: String): Unit = {
    val q = stream.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  private def hasOutput(path: String): Boolean = {
    val dir = new java.io.File(path)
    dir.exists() && dir.listFiles().exists(_.getName.endsWith(".parquet"))
  }

  private type FPair = (Long, Option[Long], Option[Long], Option[Long], Option[Long])
  private def fullRows(path: String): Set[FPair] = {
    if (!hasOutput(path)) return Set.empty
    spark.read.parquet(path)
      .select("user_id", "purch_id", "click_id", "purch_us", "click_us")
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), opt(1), opt(2), opt(3), opt(4))
      }.toSet
  }

  private def semiRows(path: String): Set[(Long, Long, Long)] = {
    if (!hasOutput(path)) return Set.empty
    spark.read.parquet(path).select("user_id", "purch_id", "purch_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  // event row: (event_id, ts_ns, user_id, event_type, value, props)
  private def ev(id: Long, tSec: Long, user: Long, tpe: String): Row =
    Row(id, tSec * 1000000000L, user, tpe, 1.0: java.lang.Double, "{}")

  private def withDeterministicBatches[A](body: => A): A = {
    val noData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData)
  }

  test("full outer: each side's NULL row finalizes at ITS OWN instant — the click waits a window longer") {
    withDeterministicBatches {
      val src = Files.createTempDirectory("graft-ssf-src").toString
      val out = Files.createTempDirectory("graft-ssf-out").toString
      val ckpt = Files.createTempDirectory("graft-ssf-ckpt").toString
      def pass(): Unit = runPass(
        StreamingJobs.clickPurchaseFullOuterJoinStream(spark, src, "10 seconds"),
        out, ckpt)
      // chunk 1: matched pair (c1@100 → p2@120, user 1), unmatched
      // purchase p1@150 (user 2), unmatched click c2@130 (user 3).
      // Batch 1 runs with wm=0: only the matched pair emits.
      writeChunk(src, Seq(
        ev(101, 100, 1, "click"), ev(201, 120, 1, "purchase"),
        ev(202, 150, 2, "purchase"), ev(102, 130, 3, "click")))
      pass()
      val after1 = fullRows(out)
      assert(after1 == Set((1L, Some(201L), Some(101L),
        Some(120000000L), Some(100000000L))),
        s"batch 1 must emit exactly the matched pair: $after1")
      // chunk 2: sentinels @400s. Batch 2 uses batch 1's wm (150−10 =
      // 140s): neither NULL row is final (140 < 150 and 140 < 130+3600).
      writeChunk(src, Seq(ev(301, 400, 99, "click"), ev(302, 400, 98, "purchase")))
      pass()
      val after2 = fullRows(out)
      assert(after2 == after1, s"wm=140s emitted early: ${after2 -- after1}")
      // chunk 3: sentinels @4000s. Batch 3 wm = 390s: PAST p1's 150s →
      // its NULL-click row emits; NOT past c2's 130+3600 = 3730s → the
      // click's NULL-purchase row is still withheld. The asymmetry.
      writeChunk(src, Seq(ev(303, 4000, 97, "click"), ev(304, 4000, 96, "purchase")))
      pass()
      val after3 = fullRows(out).filter(_._1 <= 3)
      assert(after3 -- after1 == Set((2L, Some(202L), None, Some(150000000L), None)),
        s"wm=390s must finalize exactly p1's side: ${after3 -- after1}")
      // chunk 4: sentinels @5000s. Batch 4 wm = 3990s > 3730s → c2's
      // NULL-purchase row finally emits, a full window after p1's.
      writeChunk(src, Seq(ev(305, 5000, 95, "click"), ev(306, 5000, 94, "purchase")))
      pass()
      val after4 = fullRows(out).filter(_._1 <= 3)
      assert(after4 -- after3 == Set((3L, None, Some(102L), None, Some(130000000L))),
        s"wm=3990s must finalize exactly c2's side: ${after4 -- after3}")
    }
  }

  test("drained full-outer stream equals the batch FULL JOIN exactly at gate") {
    withDeterministicBatches {
      val events = Tables.events(spark, sf)
      val delaySec = LateArrival.globalLateness(events).collect()
        .map(_.getAs[Long]("max_behind_us")).max / 1000000 + 1
      val src = Files.createTempDirectory("graft-ssf2-src").toString
      val out = Files.createTempDirectory("graft-ssf2-out").toString
      val ckpt = Files.createTempDirectory("graft-ssf2-ckpt").toString
      def pass(): Unit = runPass(
        StreamingJobs.clickPurchaseFullOuterJoinStream(spark, src, s"$delaySec seconds"),
        out, ckpt)
      val ordered = events.orderBy("event_id")
        .select(col("event_id"), unix_micros(col("ts")).as("t_us"),
          col("user_id"), col("event_type"), col("value"))
        .collect()
      val maxSec = ordered.map(_.getLong(1)).max / 1000000
      ordered.grouped(math.max(ordered.length / 4, 1)).foreach { c =>
        writeChunk(src, c.map(r => Row(r.getLong(0), r.getLong(1) * 1000L,
          r.getLong(2), r.getString(3), r.getAs[java.lang.Double](4), "{}")).toSeq)
        pass()
      }
      // two sentinel passes: the second runs with wm = maxSec + 2 days −
      // delay, past every real click's click_ts + window (1 h ≪ 2 days)
      Seq(2L, 3L).foreach { d =>
        val t = maxSec + d * 86400L
        writeChunk(src, Seq(
          ev(-d * 2, t, -7 - d, "click"), ev(-d * 2 - 1, t, -17 - d, "purchase")))
        pass()
      }
      val streamed = fullRows(out).filter(_._1 >= 0)
      val batch = StreamingJobs.batchClickPurchaseFullOuterPairs(events)
        .collect().map { r =>
          def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          (r.getLong(0), opt(1), opt(2), opt(3), opt(4))
        }.toSet
      val nullP = batch.count(_._3.isEmpty)
      val nullC = batch.count(_._2.isEmpty)
      assert(nullP > 0 && nullC > 0 && batch.size > nullP + nullC,
        s"gate fixture vacuous: $nullP purchase-NULLs, $nullC click-NULLs of ${batch.size}")
      assert(streamed == batch,
        s"full-outer stream diverged: missing=${(batch -- streamed).take(3)} " +
          s"extra=${(streamed -- batch).take(3)}")
    }
  }

  test("left semi: one row per attributed purchase, on FIRST match arrival; unmatched never emit") {
    withDeterministicBatches {
      val src = Files.createTempDirectory("graft-sss-src").toString
      val out = Files.createTempDirectory("graft-sss-out").toString
      val ckpt = Files.createTempDirectory("graft-sss-ckpt").toString
      def pass(): Unit = runPass(
        StreamingJobs.clickPurchaseSemiJoinStream(spark, src, "10 seconds"),
        out, ckpt)
      // chunk 1: TWO clicks both attributing p2 (user 1) + an unmatched
      // purchase p1 (user 2). Semi emits p2 exactly ONCE despite two
      // matches in the same batch — and emits it with wm still 0: no
      // watermark gating on the match path.
      writeChunk(src, Seq(
        ev(101, 90, 1, "click"), ev(102, 100, 1, "click"),
        ev(201, 120, 1, "purchase"), ev(202, 150, 2, "purchase")))
      pass()
      val after1 = semiRows(out)
      assert(after1 == Set((1L, 201L, 120000000L)),
        s"batch 1 must emit p2 exactly once: $after1")
      // two watermark-advancing passes: far past p1's 150s — the
      // unmatched purchase must STILL never emit (semi has no NULL path)
      Seq(4000L, 5000L).zipWithIndex.foreach { case (t, i) =>
        writeChunk(src, Seq(ev(300 + i, t, 99 - i, "click")))
        pass()
      }
      val drained = semiRows(out).filter(_._1 <= 2)
      assert(drained == after1,
        s"unmatched purchase leaked from the semi join: ${drained -- after1}")
    }
  }

  test("drained left-semi stream equals the batch LEFT SEMI join exactly at gate") {
    withDeterministicBatches {
      val events = Tables.events(spark, sf)
      val delaySec = LateArrival.globalLateness(events).collect()
        .map(_.getAs[Long]("max_behind_us")).max / 1000000 + 1
      val src = Files.createTempDirectory("graft-sss2-src").toString
      val out = Files.createTempDirectory("graft-sss2-out").toString
      val ckpt = Files.createTempDirectory("graft-sss2-ckpt").toString
      def pass(): Unit = runPass(
        StreamingJobs.clickPurchaseSemiJoinStream(spark, src, s"$delaySec seconds"),
        out, ckpt)
      val ordered = events.orderBy("event_id")
        .select(col("event_id"), unix_micros(col("ts")).as("t_us"),
          col("user_id"), col("event_type"), col("value"))
        .collect()
      ordered.grouped(math.max(ordered.length / 4, 1)).foreach { c =>
        writeChunk(src, c.map(r => Row(r.getLong(0), r.getLong(1) * 1000L,
          r.getLong(2), r.getString(3), r.getAs[java.lang.Double](4), "{}")).toSeq)
        pass()
      }
      // no sentinel drain needed: semi emission is match-arrival-driven,
      // and an arrival-ordered replay has seen both sides by the end —
      // parity WITHOUT a watermark advance is itself part of the pin
      val streamed = semiRows(out)
      val batch = StreamingJobs.batchClickPurchaseSemiPairs(events)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty, "gate fixture vacuous: no attributed purchases")
      assert(streamed == batch,
        s"semi stream diverged: missing=${(batch -- streamed).take(3)} " +
          s"extra=${(streamed -- batch).take(3)}")
    }
  }
}
