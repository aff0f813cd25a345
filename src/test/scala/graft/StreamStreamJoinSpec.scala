package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LateArrival
import graft.streaming.StreamingJobs

/** The stream-stream range join twin: purchases ⋈ clicks inside the
  * trailing attribution window, both sides unbounded, dual watermarks.
  * Inner-join emission needs both sides present but not watermark
  * passage, so the drained chunked replay must equal the batch twin's
  * pair set row for row. */
class StreamStreamJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("drained stream-stream pairs equal the batch range join exactly") {
    val events = Tables.events(spark, sf)
    val delaySec = LateArrival.globalLateness(events).collect()
      .map(_.getAs[Long]("max_behind_us")).max / 1000000 + 1
    val src = Files.createTempDirectory("graft-ssj-src").toString
    val out = Files.createTempDirectory("graft-ssj-out").toString
    val ckpt = Files.createTempDirectory("graft-ssj-ckpt").toString
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
      val q = StreamingJobs.clickPurchaseJoinStream(spark, src, s"$delaySec seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    type Pair = (Long, Long, Long, Long, Long)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Pair] = df
      .select("user_id", "purch_id", "click_id", "purch_us", "click_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val streamed = rows(spark.read.parquet(out))
    val batch = rows(StreamingJobs.batchClickPurchasePairs(events))
    assert(batch.nonEmpty, "no click→purchase pairs at gate SF — parity vacuous")
    assert(streamed == batch,
      s"stream-stream diverged: missing=${(batch -- streamed).take(3)} " +
        s"extra=${(streamed -- batch).take(3)}")
  }
}
