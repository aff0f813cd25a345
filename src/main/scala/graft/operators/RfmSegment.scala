package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM SEGMENTATION (round 8, continuation; DEPARTITIONED round 17 —
  * the r16 weak finding): the classic recency/frequency/monetary
  * customer segmentation over orders: each customer scored 1–4 per
  * dimension by quartile, rolled up to the (r, f, m) segment matrix
  * with counts and value mass. The marketing twin of [[UserLtv]]'s
  * flat feature frame — what a campaign targets ("4-4-4 champions",
  * "1-4-4 at-risk big spenders").
  *
  * Cross-engine exactness (§6): recency is integer days from the 1-row
  * max-order-date fact, frequency an exact count, monetary exact cents;
  * the quartile boundaries are RANK-SELECTED order statistics over the
  * customer frame ([[LengthQuantiles]] discipline) and the score CASE
  * compares integers against those exact boundaries — identical text
  * both engines, no percent_rank.
  *
  * Scale shape (round 17): the r16 form ranked the customer frame with
  * THREE unpartitioned row_number windows — one un-splittable global
  * sort task per dimension at 10⁸–10⁹ customers, the exact WindowExec
  * single-partition class this repo eliminated in zipf_check and
  * equidepth_hist. Now the boundaries come from the
  * [[EquidepthHist.equidepthHistRange]] offset algebra applied to all
  * three dimensions AT ONCE: stack the customer frame into (dim, v)
  * rows, collapse to per-(dim, value) counts (map-combinable — the
  * value domain, not the customer count, bounds what moves next),
  * range-partition by (dim, v), convert per-partition totals into
  * broadcast cumulative offsets, and read each dimension's three rank
  * targets out of a containment join — every window below is
  * partitioned by (dim) or (dim, pid), splittable by construction
  * (PlanShapeSpec pins zero unpartitioned WindowExec; the window twin
  * is kept private for the row-identity spec at numParts ∈
  * {1,3,8,32}). The value at a global rank is well-defined regardless
  * of row_number's tie order — equal values are adjacent in any sorted
  * order — so the rewrite shares the window form's oracle verbatim.
  */
object RfmSegment {

  /** Per-customer (recency, freq, monetary) base frame — shared by both
    * forms. Checkpointed: it feeds the boundary pipeline AND the
    * scoring join (the multi-consumer invariant). */
  private def baseFrame(orders: DataFrame): DataFrame = {
    val cust = orders
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
      .groupBy("o_custkey")
      .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
        sum("cents").as("monetary"))
    val ref = cust.agg(max("last_day").as("ref_day"))
    cust.crossJoin(broadcast(ref))
      .withColumn("recency", expr("ref_day - last_day"))
      .select("o_custkey", "recency", "freq", "monetary")
      .localCheckpoint()
  }

  private val Dims = Seq("recency", "freq", "monetary")

  private def score(dim: String, invert: Boolean): String = {
    // low recency = GOOD (score 4); high freq/monetary = good
    val (s1, s2, s3, s4) = if (invert) (4, 3, 2, 1) else (1, 2, 3, 4)
    s"""CASE WHEN $dim <= ${dim}_q25 THEN $s1
       |     WHEN $dim <= ${dim}_q50 THEN $s2
       |     WHEN $dim <= ${dim}_q75 THEN $s3
       |     ELSE $s4 END""".stripMargin
  }

  private def segments(base: DataFrame, bounds: DataFrame): DataFrame =
    base.crossJoin(broadcast(bounds))
      .withColumn("r_score", expr(score("recency", invert = true)))
      .withColumn("f_score", expr(score("freq", invert = false)))
      .withColumn("m_score", expr(score("monetary", invert = false)))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), sum("monetary").as("monetary_cents"))

  def rfmSegment(orders: DataFrame, numParts: Int = 0): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else orders.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "200").toInt.max(1)
    val base = baseFrame(orders)
    // all three dimensions through ONE offset-algebra pass: (dim, v)
    // value collapse, range partition, per-(dim, pid) local cumulative +
    // broadcast offsets — no global sort anywhere
    val long = base.select(expr(
      "stack(3, 'recency', recency, 'freq', freq, 'monetary', monetary) AS (dim, v)"))
    val vc = long.groupBy("dim", "v").agg(count(lit(1)).as("cnt"))
      .repartitionByRange(parts, col("dim"), col("v"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // feeds totals AND the cumulative join
    val totals = vc.groupBy("dim", "pid").agg(sum("cnt").as("ptotal"))
      .localCheckpoint() // 3×parts rows; feeds offsets AND rank targets
    // lexicographic (dim, v) ranges make pid order == value order within
    // each dim, so the per-dim running total over pid IS the offset —
    // a catalog-sized window (≤ parts rows per dim)
    val wOff = Window.partitionBy("dim").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("offset", coalesce(sum("ptotal").over(wOff), lit(0L)))
      .select(col("dim").as("o_dim"), col("pid").as("o_pid"), col("offset"))
    val wLocal = Window.partitionBy("dim", "pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc.join(broadcast(offsets),
        col("dim") === col("o_dim") && col("pid") === col("o_pid"))
      .withColumn("cum", sum("cnt").over(wLocal) + col("offset"))
      .select("dim", "v", "cnt", "cum")
    // rank targets per dim: the window form's exact indices over the
    // same n (one stacked row per customer per dim)
    val targets = totals.groupBy("dim").agg(sum("ptotal").as("n"))
      .select(col("dim").as("t_dim"), explode(expr(
        Seq(25, 50, 75).map(p =>
          s"struct($p AS p, ((n - 1) * $p) div 100 + 1 AS r)")
          .mkString("array(", ", ", ")"))).as("s"))
      .select(col("t_dim"), col("s.p").as("p"), col("s.r").as("r"))
    val nine = cum.join(broadcast(targets),
        col("dim") === col("t_dim") &&
          col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
      .select(col("dim"), col("p"), col("v"))
    val boundAggs = Dims.flatMap(d => Seq(25, 50, 75).map(p =>
      max(when(col("dim") === d && col("p") === p, col("v")))
        .as(s"${d}_q$p")))
    val bounds = nine.groupBy().agg(boundAggs.head, boundAggs.tail: _*)
    segments(base, bounds)
  }

  /** The r16 three-global-windows form, kept PRIVATE for the
    * row-identity measurement (the SubstringDedup/PrefixJoin demotion
    * precedent): its rank windows move the whole customer frame onto
    * one task each — correct, never registered. */
  private[graft] def rfmSegmentWindow(orders: DataFrame): DataFrame = {
    val base = baseFrame(orders)
    def bound(dim: String, p: Int): org.apache.spark.sql.Column =
      max(when(expr(s"rn_$dim = ((n - 1) * $p) div 100 + 1"), col(dim)))
        .as(s"${dim}_q$p")
    val ranked = base
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rn_recency", row_number().over(Window.orderBy(col("recency"))))
      .withColumn("rn_freq", row_number().over(Window.orderBy(col("freq"))))
      .withColumn("rn_monetary", row_number().over(Window.orderBy(col("monetary"))))
    val bounds = ranked.select(
      Dims.flatMap(d => Seq(25, 50, 75).map(p => bound(d, p))): _*)
    segments(base, bounds)
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
