package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PROMO REVENUE SHARE (round 8, continuation 5) — the TPC-H Q14
  * shape: what fraction of each ship-month's revenue came from PROMO
  * parts — a conditional-aggregate-over-join with a dimension
  * attribute deciding the numerator. The classic "campaign lift"
  * readout, and the plan point is that the promo test rides the
  * BROADCAST dim join as a map-side flag — no second scan, no
  * pre-aggregation per branch.
  *
  * Cross-engine exactness (SURVEY §6): exact cents both sums; month
  * key is `year·100 + month` of the µs-truncated timestamp (calendar
  * fields, locale-free under UTC — [[TradeVolume]]'s year rule);
  * share in integer ppm with the greatest-1 guard (a month with only
  * non-promo revenue reports 0, exactly).
  *
  * Scale shape: one lineitem scan (2 columns + the key), part
  * broadcast, one |months|-sized combinable agg.
  */
object PromoShare {

  def q14PromoShare(lineitem: DataFrame, part: DataFrame): DataFrame = {
    lineitem
      .select(col("l_partkey"),
        expr("CAST(year(CAST(l_shipdate AS TIMESTAMP)) * 100 + month(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)")
          .as("ship_month"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
          .as("cents"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(sum("cents").as("revenue_cents"),
        sum(expr("CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END"))
          .as("promo_cents"))
      .select(col("ship_month"), col("revenue_cents"), col("promo_cents"),
        expr("promo_cents * 1000000 div greatest(revenue_cents, 1)")
          .as("promo_ppm"))
  }

  def q14PromoShareQ(lineitem: DataFrame, part: DataFrame): DataFrame =
    q14PromoShare(lineitem, part).orderBy("ship_month")

  val q14PromoShareSql: String =
    """SELECT CAST(year(date_trunc('microseconds', l_shipdate)) * 100
      |          + month(date_trunc('microseconds', l_shipdate)) AS BIGINT) AS ship_month,
      |       CAST(sum(cents) AS BIGINT) AS revenue_cents,
      |       CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
      |       CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) * 1000000
      |         // greatest(CAST(sum(cents) AS BIGINT), 1) AS promo_ppm
      |FROM (
      |  SELECT l_partkey, l_shipdate,
      |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents
      |  FROM lineitem
      |) JOIN part ON l_partkey = p_partkey
      |GROUP BY 1
      |ORDER BY ship_month""".stripMargin
}
