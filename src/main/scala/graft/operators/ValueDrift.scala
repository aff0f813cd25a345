package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VALUE-distribution drift between time halves (round 8, continuation)
  * — per event type, the total-variation distance between the value
  * distribution of the stream's first and second half (split at the
  * midpoint of the observed time range): the numeric-drift monitor
  * beside [[RateSpike]]'s volume monitor — a payment-amount
  * distribution that moved is an incident even when the COUNT curve is
  * flat. [[SourceDivergence]] applies the TV discipline to the token
  * distribution; this applies it to a numeric column over time.
  *
  * Cross-engine exactness (§6): values bucket into the
  * [[TokenHistogram]] power-of-two CASE over cents (no log2); each
  * half's bucket distribution is quantized to exact integer ppm
  * (`c·10⁶ div n_half`), and TV = `Σ |ppm_a − ppm_b| div 2` stays a
  * pure BIGINT — no float anywhere. The midpoint is integer µs
  * arithmetic on the 1-row min/max fact.
  *
  * Scale shape: one map pass against the broadcast 1-row bounds fact,
  * one map-side-combinable (type, half, bucket) count, then
  * catalog-sized reshaping (≤ |types|·|buckets| rows) via conditional
  * sums — the full-outer bucket alignment problem is solved by grouping
  * halves as columns, so a bucket missing from one half contributes its
  * whole ppm mass, never a dropped row.
  */
object ValueDrift {

  /** Bucket lower bounds in cents: 0, 1, 2, … 2²⁰; last open. */
  val BucketBounds: Seq[Long] = 0L +: (0 to 20).map(1L << _)

  private val bucketCase: String =
    BucketBounds.sliding(2).collect { case Seq(lo, hi) =>
      s"WHEN cents < $hi THEN $lo"
    }.mkString("CASE ", " ", s" ELSE ${BucketBounds.last} END")

  def valueDrift(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"),
      unix_micros(col("ts")).as("t_us"),
      expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    val bounds = e.agg(min("t_us").as("lo"), max("t_us").as("hi"))
    val cells = e.crossJoin(broadcast(bounds))
      .withColumn("half", expr("CASE WHEN t_us * 2 < lo + hi THEN 0 ELSE 1 END"))
      .withColumn("bucket", expr(bucketCase))
      .groupBy("event_type", "half", "bucket")
      .agg(count(lit(1)).as("c"))
    val halves = cells
      .withColumn("n_half",
        expr("sum(c) OVER (PARTITION BY event_type, half)"))
      .withColumn("ppm", expr("c * 1000000 div n_half"))
      .groupBy("event_type", "bucket")
      .agg(
        coalesce(sum(when(col("half") === 0, col("ppm"))), lit(0L)).as("ppm_a"),
        coalesce(sum(when(col("half") === 1, col("ppm"))), lit(0L)).as("ppm_b"))
    halves.groupBy("event_type")
      .agg(expr("sum(abs(ppm_a - ppm_b)) div 2").as("tv_ppm"),
        count(lit(1)).as("n_buckets"))
      .select(col("event_type"), col("tv_ppm"), col("n_buckets"))
  }

  def valueDriftQ(events: DataFrame): DataFrame =
    valueDrift(events).orderBy("event_type")

  val valueDriftSql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |), bounds AS (
       |  SELECT min(t_us) AS lo, max(t_us) AS hi FROM e
       |), cells AS (
       |  SELECT event_type,
       |         CASE WHEN t_us * 2 < lo + hi THEN 0 ELSE 1 END AS half,
       |         $bucketCase AS bucket,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM e CROSS JOIN bounds
       |  GROUP BY 1, 2, 3
       |), halves AS (
       |  SELECT event_type, bucket,
       |         CAST(COALESCE(sum(CASE WHEN half = 0 THEN ppm END), 0) AS BIGINT) AS ppm_a,
       |         CAST(COALESCE(sum(CASE WHEN half = 1 THEN ppm END), 0) AS BIGINT) AS ppm_b
       |  FROM (
       |    SELECT event_type, half, bucket,
       |           c * 1000000 // CAST(sum(c) OVER (PARTITION BY event_type, half) AS BIGINT) AS ppm
       |    FROM cells
       |  )
       |  GROUP BY 1, 2
       |)
       |SELECT event_type,
       |       CAST(sum(abs(ppm_a - ppm_b)) // 2 AS BIGINT) AS tv_ppm,
       |       CAST(count(*) AS BIGINT) AS n_buckets
       |FROM halves
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
}
