package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GROUPING SETS aggregation (round 13) — the third member of the
  * multi-granularity plan class: [[Relational.rollupAgg]] is the
  * hierarchy prefix chain, [[CubeAgg]] the full 2³ lattice; GROUPING
  * SETS is the general form — an ARBITRARY set list, here the shape a
  * real report actually wants: the (returnflag, linestatus) detail, the
  * returnflag subtotal, and an UNRELATED ship-year breakdown in the
  * same pass. One Expand over one scan (3 replicas — vs 3 scans for 3
  * GROUP BYs), every aggregate map-side partial.
  *
  * §6: `gid` is the ANSI grouping bitmask over the groupBy column order
  * (flag, status, ship_year) — Spark `grouping_id()` ≡ DuckDB
  * `GROUPING(...)`, both BIGINT-cast; quantities ride the cube's
  * integer-deci rule; absent dims coalesce to 'ALL' (the rollup
  * convention) and gid disambiguates a real 'ALL' string from an
  * aggregated one. Total order (gid, dims). */
object GroupingSetsAgg {

  def groupingSetsAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)").as("yr"),
        expr("CAST(round(l_quantity * 10.0) AS BIGINT)").as("qty_deci"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")),
          Seq(col("yr"))),
        col("l_returnflag"), col("l_linestatus"), col("yr"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), sum("qty_deci").as("sum_qty_deci"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        coalesce(col("yr").cast("string"), lit("ALL")).as("ship_year"),
        col("n"), col("sum_qty_deci"))

  def groupingSetsAggQ(lineitem: DataFrame): DataFrame =
    groupingSetsAgg(lineitem).orderBy("gid", "returnflag", "linestatus", "ship_year")

  val groupingSetsAggSql: String =
    """SELECT CAST(GROUPING(l_returnflag, l_linestatus, yr) AS BIGINT) AS gid,
      |       coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       coalesce(CAST(yr AS VARCHAR), 'ALL') AS ship_year,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(qty_deci) AS BIGINT) AS sum_qty_deci
      |FROM (SELECT l_returnflag, l_linestatus,
      |             CAST(year(date_trunc('microseconds', l_shipdate)) AS BIGINT) AS yr,
      |             CAST(round(l_quantity * 10.0) AS BIGINT) AS qty_deci
      |      FROM lineitem)
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (yr))
      |ORDER BY gid, returnflag, linestatus, ship_year""".stripMargin
}
