package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INTER-ARRIVAL time histogram (round 8, continuation) — per event
  * type, the power-of-two distribution of gaps between a user's
  * consecutive events of that type. The cadence readout behind session
  * gap calibration ([[Sessionize.GapUs]] is exactly a cut on this
  * distribution), bot detection (machine cadences spike one bucket) and
  * retention modeling (the purchase-to-purchase gap curve).
  *
  * Cross-engine exactness (§6): gaps are integer seconds
  * (`µs-difference div 10⁶`); buckets are the [[TokenHistogram]] CASE
  * discipline — integer range bounds generated from one Scala list, no
  * `log2`; shares are integer ppm of the type's gap count.
  *
  * Scale shape: one lag window per (user, type) stream — a single
  * exchange on the (user_id, event_type) hash — then a
  * map-side-combinable (type, bucket) count; the ppm share is a window
  * over the ≤ |types|·|buckets| result frame. Nothing after the lag
  * touches data volume.
  */
object Interarrival {

  /** Bucket lower bounds in seconds: 0, 1, 2, 4, … 2²⁰; last open. */
  val BucketBounds: Seq[Long] = 0L +: (0 to 20).map(1L << _)

  private[graft] val bucketCase: String =
    BucketBounds.sliding(2).collect { case Seq(lo, hi) =>
      s"WHEN gap_sec < $hi THEN $lo"
    }.mkString("CASE ", " ", s" ELSE ${BucketBounds.last} END")

  def eventInterarrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("t_us"), col("event_id"))
    val perType = Window.partitionBy("event_type")
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("prev_us", lag("t_us", 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_sec", expr("(t_us - prev_us) div 1000000"))
      .withColumn("bucket", expr(bucketCase))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("share_ppm",
        expr("n_gaps * 1000000 div sum(n_gaps) OVER (PARTITION BY event_type)"))
      .select(col("event_type"), col("bucket"), col("n_gaps"), col("share_ppm"))
  }

  def eventInterarrivalQ(events: DataFrame): DataFrame =
    eventInterarrival(events).orderBy("event_type", "bucket")

  val eventInterarrivalSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, event_id,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us
       |  FROM events
       |), g AS (
       |  SELECT event_type,
       |         (t_us - lag(t_us) OVER (PARTITION BY user_id, event_type
       |                                 ORDER BY t_us, event_id)) // 1000000 AS gap_sec
       |  FROM e
       |), b AS (
       |  SELECT event_type, $bucketCase AS bucket
       |  FROM g WHERE gap_sec IS NOT NULL
       |), c AS (
       |  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_gaps
       |  FROM b GROUP BY 1, 2
       |)
       |SELECT event_type, bucket, n_gaps,
       |       n_gaps * 1000000 // CAST(sum(n_gaps) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm
       |FROM c
       |ORDER BY event_type, bucket""".stripMargin
}
