package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM SEGMENTATION (round 8, continuation) — the classic
  * recency/frequency/monetary customer segmentation over orders: each
  * customer scored 1–4 per dimension by quartile, rolled up to the
  * (r, f, m) segment matrix with counts and value mass. The marketing
  * twin of [[UserLtv]]'s flat feature frame — what a campaign targets
  * ("4-4-4 champions", "1-4-4 at-risk big spenders").
  *
  * Cross-engine exactness (§6): recency is integer days from the 1-row
  * max-order-date fact, frequency an exact count, monetary exact cents;
  * the quartile boundaries are RANK-SELECTED order statistics over the
  * customer frame ([[LengthQuantiles]] discipline) and the score CASE
  * compares integers against those exact boundaries — identical text
  * both engines, no percent_rank.
  *
  * Scale shape: one map-side-combinable per-customer aggregation
  * collapses order volume first; the three rank windows run over the
  * CUSTOMER frame (already ≪ orders; the histogram two-pass rewrite —
  * [[Curation.qualitySelect]] — is the dial if customers themselves
  * explode); boundaries are a 1-row broadcast fact; the segment rollup
  * is ≤ 64 cells.
  */
object RfmSegment {

  def rfmSegment(orders: DataFrame): DataFrame = {
    val cust = orders
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
      .groupBy("o_custkey")
      .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
        sum("cents").as("monetary"))
    val ref = cust.agg(max("last_day").as("ref_day"))
    val base = cust.crossJoin(broadcast(ref))
      .withColumn("recency", expr("ref_day - last_day"))
      .select("o_custkey", "recency", "freq", "monetary")
      .localCheckpoint() // feeds three rank windows AND the scoring join
    def bound(dim: String, p: Int): org.apache.spark.sql.Column =
      max(when(expr(s"rn_$dim = ((n - 1) * $p) div 100 + 1"), col(dim)))
        .as(s"${dim}_q$p")
    val ranked = base
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rn_recency", row_number().over(Window.orderBy(col("recency"))))
      .withColumn("rn_freq", row_number().over(Window.orderBy(col("freq"))))
      .withColumn("rn_monetary", row_number().over(Window.orderBy(col("monetary"))))
    val bounds = ranked.select(
      Seq("recency", "freq", "monetary").flatMap(d =>
        Seq(25, 50, 75).map(p => bound(d, p))): _*)
    def score(dim: String, invert: Boolean): String = {
      // low recency = GOOD (score 4); high freq/monetary = good
      val (s1, s2, s3, s4) = if (invert) (4, 3, 2, 1) else (1, 2, 3, 4)
      s"""CASE WHEN $dim <= ${dim}_q25 THEN $s1
         |     WHEN $dim <= ${dim}_q50 THEN $s2
         |     WHEN $dim <= ${dim}_q75 THEN $s3
         |     ELSE $s4 END""".stripMargin
    }
    base.crossJoin(broadcast(bounds))
      .withColumn("r_score", expr(score("recency", invert = true)))
      .withColumn("f_score", expr(score("freq", invert = false)))
      .withColumn("m_score", expr(score("monetary", invert = false)))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), sum("monetary").as("monetary_cents"))
  }

  def rfmSegmentQ(orders: DataFrame): DataFrame =
    rfmSegment(orders).orderBy("r_score", "f_score", "m_score")

  val rfmSegmentSql: String = {
    def boundsSel(dim: String): String =
      Seq(25, 50, 75).map(p =>
        s"max(CASE WHEN rn_$dim = ((n - 1) * $p) // 100 + 1 THEN $dim END) AS ${dim}_q$p")
        .mkString(",\n       |         ")
    def score(dim: String, inv: Boolean): String = {
      val (s1, s2, s3, s4) = if (inv) (4, 3, 2, 1) else (1, 2, 3, 4)
      s"CASE WHEN $dim <= ${dim}_q25 THEN $s1 WHEN $dim <= ${dim}_q50 THEN $s2 " +
        s"WHEN $dim <= ${dim}_q75 THEN $s3 ELSE $s4 END"
    }
    s"""WITH cust AS (
       |  SELECT o_custkey,
       |         max(epoch_us(date_trunc('microseconds', o_orderdate)) // 86400000000) AS last_day,
       |         CAST(count(*) AS BIGINT) AS freq,
       |         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS monetary
       |  FROM orders GROUP BY 1
       |), ref AS (
       |  SELECT max(last_day) AS ref_day FROM cust
       |), base AS (
       |  SELECT o_custkey, ref_day - last_day AS recency, freq, monetary
       |  FROM cust CROSS JOIN ref
       |), ranked AS (
       |  SELECT *,
       |         CAST(count(*) OVER () AS BIGINT) AS n,
       |         row_number() OVER (ORDER BY recency) AS rn_recency,
       |         row_number() OVER (ORDER BY freq) AS rn_freq,
       |         row_number() OVER (ORDER BY monetary) AS rn_monetary
       |  FROM base
       |), bounds AS (
       |  SELECT ${boundsSel("recency")},
       |         ${boundsSel("freq")},
       |         ${boundsSel("monetary")}
       |  FROM ranked
       |)
       |SELECT ${score("recency", inv = true)} AS r_score,
       |       ${score("freq", inv = false)} AS f_score,
       |       ${score("monetary", inv = false)} AS m_score,
       |       CAST(count(*) AS BIGINT) AS n_customers,
       |       CAST(sum(monetary) AS BIGINT) AS monetary_cents
       |FROM base CROSS JOIN bounds
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin
  }
}
