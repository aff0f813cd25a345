package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LateArrival, Relational}
import graft.streaming.StreamingJobs

/** The audit → watermark wiring, both directions: a delay derived from
  * [[LateArrival.globalLateness]] drops ZERO events across
  * arrival-ordered micro-batches (closed windows equal the batch twin
  * exactly), and the SAME replay with an unsized (zero) delay provably
  * drops the late event — the diagnostic is load-bearing, not
  * decorative. */
class WatermarkSpec extends AnyFunSuite {
  import SparkTestSession._

  private val H = 3600L * 1000000L // one hour in µs

  /** Arrival-ordered batches: (event_id, t_us, user_id). Batch 2's event
    * is ~2h50m behind the global high-watermark set in batch 1; batch 3
    * advances the watermark far enough to CLOSE the late event's window,
    * so "kept vs dropped" becomes observable in append-mode output. */
  private val batches: Seq[Seq[(Long, Long, Long)]] = Seq(
    Seq((1L, 1 * H + 300000000L, 1L), (2L, 5 * H, 2L)),
    Seq((3L, 2 * H + 600000000L, 1L)),
    Seq((4L, 9 * H, 2L)))

  private def syntheticEvents: DataFrame = {
    val rows = batches.flatten.map { case (id, tUs, u) =>
      Row(id, tUs, u, "click", 1.0: java.lang.Double)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("t_us", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
      .withColumn("ts", expr("timestamp_micros(t_us)"))
  }

  /** Replays the synthetic batches through [[StreamingJobs.windowAggStream]]
    * at `delay`, one micro-batch per arrival chunk (the asof-ooo
    * writeBatch pattern), and returns the emitted (window_start_us, n). */
  private def replay(delay: String, tag: String): Set[(Long, Long)] = {
    val src = Files.createTempDirectory(s"graft-wm-src-$tag").toString
    val out = Files.createTempDirectory(s"graft-wm-out-$tag").toString
    val ckpt = Files.createTempDirectory(s"graft-wm-ckpt-$tag").toString
    batches.foreach { b =>
      val rows = b.map { case (id, tUs, u) =>
        Row(id, tUs * 1000L, u, "click", 1.0: java.lang.Double, "{}")
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StreamingJobs.eventsRawSchema(tsIsLong = true))
        .write.mode("append").parquet(src)
      val q = StreamingJobs.windowAggStream(spark, src, delay)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    spark.read.parquet(out)
      .select(unix_micros(col("window_start")).as("ws"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("audit-derived delay keeps the late event; zero delay provably drops it") {
    // 1. derive the delay FROM the audit — no hand-picked constant
    val audit = LateArrival.globalLateness(syntheticEvents).collect()
    val maxBehindUs = audit.map(_.getAs[Long]("max_behind_us")).max
    assert(maxBehindUs > 2 * H, s"fixture lost its late event: $maxBehindUs")
    val sized = s"${maxBehindUs / 1000000 + 1} seconds"

    // 2. sized replay: every window the final watermark closed matches
    //    the batch twin exactly — zero events dropped, the late one
    //    (window [2h,3h)) included
    val got = replay(sized, "sized")
    val finalWmUs = batches.flatten.map(_._2).max - (maxBehindUs + 1000000L)
    val expected = Relational.streamingWindowAgg(syntheticEvents)
      .filter(unix_micros(col("window_start")) + H <= finalWmUs)
      .select(unix_micros(col("window_start")).as("ws"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.exists(_._1 == 2 * H), "late window not closed — vacuous")
    assert(got == expected, s"sized replay diverged: got=$got expected=$expected")

    // 3. negative control, same data: with no delay, batch 1 advances the
    //    watermark to 5h, so the 2h event's window [2h,3h) is already
    //    finalized when it arrives in batch 2 — it MUST be dropped and
    //    the closed window set diverges from the batch twin
    val got0 = replay("0 seconds", "zero")
    assert(!got0.exists(p => p._1 == 2 * H && p._2 == 1L),
      s"unsized watermark failed to drop the late event: $got0")
  }

  test("watermarked sessionize: audit-derived delay closes batch-identically, tail sessions included") {
    import graft.operators.Sessionize
    val events = Tables.events(spark, sf)
    val delaySec = LateArrival.globalLateness(events).collect()
      .map(_.getAs[Long]("max_behind_us")).max / 1000000 + 1
    // arrival-ordered 4-chunk replay (the real-events pattern below)
    val src = Files.createTempDirectory("graft-wmsess-src").toString
    val out = Files.createTempDirectory("graft-wmsess-out").toString
    val ckpt = Files.createTempDirectory("graft-wmsess-ckpt").toString
    val ordered = events.orderBy("event_id")
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("user_id"), col("event_type"), col("value"))
      .collect()
    ordered.grouped(math.max(ordered.length / 4, 1)).foreach { c =>
      val rows = c.map(r => Row(r.getLong(0), r.getLong(1) * 1000L, r.getLong(2),
        r.getString(3), r.getAs[java.lang.Double](4), "{}"))
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
        StreamingJobs.eventsRawSchema(tsIsLong = true))
        .write.mode("append").parquet(src)
      val q = StreamingJobs.sessionizeStreamWm(spark, src, s"$delaySec seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    type Sess = (Long, Long, Long, Long, java.lang.Double)
    val streamed: Set[Sess] = spark.read.parquet(out)
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[java.lang.Double](4))).toSet
    val batch = Sessionize.sessionize(events)
    val lastSeq = batch.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("session_seq").as("mx"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Sess] = df
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[java.lang.Double](4))).toSet
    val withSucc = rows(batch.join(lastSeq, Seq("user_id"))
      .filter(col("session_seq") =!= col("mx")))
    val finals = rows(batch.join(lastSeq, Seq("user_id"))
      .filter(col("session_seq") === col("mx")))
    val wmMs = (ordered.map(_.getLong(1)).max - delaySec * 1000000L) / 1000L
    def timeoutMs(endUs: Long) =
      endUs / 1000 + Sessionize.GapUs / 1000 + 1
    // (a) every streamed row is a REAL batch session, bit for bit
    assert(streamed.subsetOf(withSucc ++ finals),
      s"phantom sessions: ${(streamed -- withSucc -- finals).take(3)}")
    // (b) nothing closed by a successor is lost
    assert(withSucc.subsetOf(streamed),
      s"lost closed sessions: ${(withSucc -- streamed).take(3)}")
    // (c) every final session safely past the watermark was emitted —
    //     the NoTimeout twin structurally cannot do this
    val due = finals.filter(s => timeoutMs(s._3) + 2 <= wmMs)
    assert(due.subsetOf(streamed), s"tail sessions not closed: ${(due -- streamed).take(3)}")
    assert(due.nonEmpty, "no tail session due — vacuous")
    // (d) nothing closed EARLY: a streamed final session's timeout had
    //     (within ms-boundary tolerance) passed the watermark
    (streamed -- withSucc).foreach { s =>
      assert(timeoutMs(s._3) <= wmMs + 2, s"session closed before its time: $s")
    }
  }

  test("real gate events: audit-derived delay reproduces the batch twin on all closed windows") {
    // The driver's events are arrival-ordered (measured: global lateness
    // is 0 at every SF), so here the audit honestly reports "in order"
    // and the derived delay is the 1 s margin alone — the degenerate
    // case where a MINIMAL watermark is provably safe. The adversarial
    // out-of-order case lives in the synthetic fixture above.
    val events = Tables.events(spark, sf)
    val audit = LateArrival.globalLateness(events).collect()
    val maxBehindUs = audit.map(_.getAs[Long]("max_behind_us")).max
    assert(maxBehindUs == 0L, "gate events grew late arrivals — revisit this spec's framing")
    val delaySec = maxBehindUs / 1000000 + 1
    val src = Files.createTempDirectory("graft-wm-real-src").toString
    val out = Files.createTempDirectory("graft-wm-real-out").toString
    val ckpt = Files.createTempDirectory("graft-wm-real-ckpt").toString
    val ordered = events.orderBy("event_id")
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"),
        col("user_id"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .collect()
    val chunks = ordered.grouped(math.max(ordered.length / 4, 1)).toSeq
    chunks.foreach { c =>
      val rows = c.map(r => Row(r.getLong(0), r.getLong(1) * 1000L, r.getLong(2),
        r.getString(3), r.getDouble(4): java.lang.Double, "{}"))
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
        StreamingJobs.eventsRawSchema(tsIsLong = true))
        .write.mode("append").parquet(src)
      val q = StreamingJobs.windowAggStream(spark, src, s"$delaySec seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    val got = spark.read.parquet(out)
      .select(unix_micros(col("window_start")).as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val finalWmUs = ordered.map(_.getLong(1)).max - delaySec * 1000000L
    val expected = Relational.streamingWindowAgg(
        events.withColumn("value", coalesce(col("value"), lit(0.0))))
      .filter(unix_micros(col("window_start")) + H <= finalWmUs)
      .select(unix_micros(col("window_start")).as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "no window closed at the derived delay — vacuous")
    assert(got == expected,
      s"derived-delay replay diverged: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }
}
