package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUBE AGGREGATION (round 8, continuation 5) — the full
  * (returnflag × linestatus × ship-year) CUBE: all 2³ grouping sets in
  * one pass, [[Relational.rollupAgg]]'s missing sibling (ROLLUP prices
  * one drill path; CUBE prices every slice a dashboard can ask for,
  * which is why OLAP engines special-case it). Plan-wise this is the
  * one shape the suite didn't cover: Spark's `Expand` operator
  * replicates each input row once per grouping set BEFORE one ordinary
  * hash aggregate — 8× the agg input, NOT 8 scans (spec pins Expand +
  * a single scan; the naive UNION-of-8-GROUP-BYs is 8 scans).
  *
  * Cross-engine exactness (SURVEY §6): exact cents revenue and BIGINT
  * counts; qty ships as integer DECI-units (quantities are synthetic
  * x.5-grained, so 10× is exact — no float sum text); the year leg is
  * the locale-free calendar year ([[TradeVolume]] discipline) rendered
  * as text with an 'ALL' coalesce — both engines' NULL grouping cells
  * take the same label (dims are non-NULL by data contract, so 'ALL'
  * is unambiguous).
  *
  * Scale shape: one scan → Expand(8) → one map-side-combinable
  * aggregate keyed by the three dims; output ≤ Π(|dim|+1) rows. The 8×
  * expand is the honest cost of eight exact slices in one pass — the
  * [[NormalizationFunnel]] multi-distinct trade, documented there too.
  */
object CubeAgg {

  def cubeAgg(lineitem: DataFrame): DataFrame = {
    lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)").as("yr"),
        expr("CAST(round(l_quantity * 10.0) AS BIGINT)").as("qty_deci"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
          .as("cents"))
      .cube("l_returnflag", "l_linestatus", "yr")
      .agg(count(lit(1)).as("n"), sum("qty_deci").as("sum_qty_deci"),
        sum("cents").as("revenue_cents"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        coalesce(col("yr").cast("string"), lit("ALL")).as("ship_year"),
        col("n"), col("sum_qty_deci"), col("revenue_cents"))
  }

  def cubeAggQ(lineitem: DataFrame): DataFrame =
    cubeAgg(lineitem).orderBy("returnflag", "linestatus", "ship_year")

  val cubeAggSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       coalesce(CAST(yr AS VARCHAR), 'ALL') AS ship_year,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(qty_deci) AS BIGINT) AS sum_qty_deci,
      |       CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(year(date_trunc('microseconds', l_shipdate)) AS BIGINT) AS yr,
      |         CAST(round(l_quantity * 10.0) AS BIGINT) AS qty_deci,
      |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents
      |  FROM lineitem
      |)
      |GROUP BY CUBE (l_returnflag, l_linestatus, yr)
      |ORDER BY returnflag, linestatus, ship_year""".stripMargin
}
