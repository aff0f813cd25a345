package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NATION-PAIR TRADE VOLUME (round 8, continuation 5) — the TPC-H Q7
  * shape: revenue between DIRECTED (supplier nation → customer nation)
  * pairs per ship year. [[Relational.q5MultiJoin]] aggregates the
  * same-nation star; this is its cross-nation complement — the full
  * directed pair × year matrix (who ships to whom, when), the classic
  * multi-join whose plan quality is all about which sides broadcast.
  *
  * Cross-engine exactness (SURVEY §6): exact cents revenue (per-row
  * round then BIGINT sum); `year()` of the µs-truncated timestamp is
  * calendar arithmetic both engines agree on under the UTC session (no
  * locale dependence — unlike weekday, which [[Seasonality]] derives
  * from integer µs for exactly that reason).
  *
  * Scale shape: lineitem→orders is the one fact-fact hash join
  * (orderkey-keyed); customer, supplier and both nation legs broadcast
  * (catalog/dim-sized); the pair grid is ≤ |nations|² · |years| rows.
  * Self-joining `nation` twice under two aliases is the standard
  * role-playing-dimension pattern — each leg broadcasts independently.
  */
object TradeVolume {

  def q7TradeVolume(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                    supplier: DataFrame, nation: DataFrame): DataFrame = {
    val ns = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val nc = nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)").as("ship_year"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
          .as("cents"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
      .join(broadcast(nc), col("c_nationkey") === col("c_nk"))
      .filter(col("s_nk") =!= col("c_nk"))
      .groupBy("supp_nation", "cust_nation", "ship_year")
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("revenue_cents"))
  }

  def q7TradeVolumeQ(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                     supplier: DataFrame, nation: DataFrame): DataFrame =
    q7TradeVolume(lineitem, orders, customer, supplier, nation)
      .orderBy("supp_nation", "cust_nation", "ship_year")

  val q7TradeVolumeSql: String =
    """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |       CAST(year(date_trunc('microseconds', l_shipdate)) AS BIGINT) AS ship_year,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT)
      |         AS revenue_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |WHERE ns.n_nationkey <> nc.n_nationkey
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin
}
