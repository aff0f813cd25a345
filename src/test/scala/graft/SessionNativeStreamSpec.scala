package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LateArrival
import graft.streaming.StreamingJobs

/** The NATIVE streaming sessionize twin: Catalyst's `session_window` in
  * append mode closes the SAME session set, row for row, as the
  * hand-rolled flatMapGroupsWithState + EventTimeTimeout twin on the same
  * arrival-ordered replay at the same audit-derived delay — state store,
  * merge and eviction all engine-owned. (Batch-side identity is
  * SessionNativeSpec; this is the streaming face.) */
class SessionNativeStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("session_window stream closes row-identically to the hand-rolled watermark twin") {
    val events = Tables.events(spark, sf)
    val delaySec = LateArrival.globalLateness(events).collect()
      .map(_.getAs[Long]("max_behind_us")).max / 1000000 + 1
    val src = Files.createTempDirectory("graft-natsess-src").toString
    val outWm = Files.createTempDirectory("graft-natsess-wm").toString
    val outNat = Files.createTempDirectory("graft-natsess-nat").toString
    val ckWm = Files.createTempDirectory("graft-natsess-ckwm").toString
    val ckNat = Files.createTempDirectory("graft-natsess-cknat").toString
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
      // both queries drain the same files on their own checkpoints
      val qw = StreamingJobs.sessionizeStreamWm(spark, src, s"$delaySec seconds")
        .writeStream.format("parquet").option("path", outWm)
        .option("checkpointLocation", ckWm)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      qw.awaitTermination(120000)
      val qn = StreamingJobs.sessionizeStreamNative(spark, src, s"$delaySec seconds")
        .writeStream.format("parquet").option("path", outNat)
        .option("checkpointLocation", ckNat)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      qn.awaitTermination(120000)
    }
    type Sess = (Long, Long, Long, Long, java.lang.Double)
    def rows(path: String): Set[Sess] = spark.read.parquet(path)
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[java.lang.Double](4))).toSet
    val wm = rows(outWm)
    val nat = rows(outNat)
    assert(wm.nonEmpty, "hand-rolled twin closed nothing — replay vacuous")
    assert(nat == wm,
      s"native diverges: missing=${(wm -- nat).take(3)} extra=${(nat -- wm).take(3)}")
  }
}
