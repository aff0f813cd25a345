package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LARGE-ORDER REPORT (round 8, continuation 5) — the TPC-H Q18 shape:
  * orders whose TOTAL line quantity crosses a threshold, with their
  * customer — a HAVING predicate on a child aggregate driving a join
  * back onto the parents. Completes the decorrelated-classic set
  * (#110 Q17 correlated AVG, #143 Q4 EXISTS, #158 Q15 max-of-agg):
  * here the aggregate IS the filter, computed once per order and
  * semi-joining the detail — never re-aggregated per probe.
  *
  * Cross-engine exactness (SURVEY §6): quantities in integer
  * DECI-units ([[CubeAgg]]'s rule — synthetic x.5 grain makes 10×
  * exact), threshold an integer compare, order value exact cents.
  *
  * Scale shape: one map-side-combinable orderkey aggregation collapses
  * lineitem, the HAVING filter cuts it to the heavy tail BEFORE any
  * join, then orderkey-joins orders and broadcasts customer. The big
  * frame is joined AFTER reduction — the plan a naive correlated
  * subquery misses.
  */
object LargeOrders {

  /** Deci-quantity threshold (= 250 units). */
  val MinQtyDeci = 2500L

  def q18LargeOrders(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame): DataFrame = {
    val heavy = lineitem
      .select(col("l_orderkey"),
        expr("CAST(round(l_quantity * 10.0) AS BIGINT)").as("qd"))
      .groupBy("l_orderkey")
      .agg(sum("qd").as("total_qty_deci"), count(lit(1)).as("n_lines"))
      .filter(col("total_qty_deci") >= MinQtyDeci)
    heavy
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("order_cents")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("total_qty_deci"), col("n_lines"), col("order_cents"))
  }

  def q18LargeOrdersQ(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame): DataFrame =
    q18LargeOrders(lineitem, orders, customer).orderBy("o_orderkey")

  val q18LargeOrdersSql: String =
    s"""WITH heavy AS (
       |  SELECT l_orderkey,
       |         CAST(sum(CAST(round(l_quantity * 10.0) AS BIGINT)) AS BIGINT) AS total_qty_deci,
       |         CAST(count(*) AS BIGINT) AS n_lines
       |  FROM lineitem
       |  GROUP BY 1
       |  HAVING sum(CAST(round(l_quantity * 10.0) AS BIGINT)) >= $MinQtyDeci
       |)
       |SELECT o_orderkey, c_custkey, c_name, total_qty_deci, n_lines,
       |       CAST(round(o_totalprice * 100.0) AS BIGINT) AS order_cents
       |FROM heavy
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_orderkey""".stripMargin
}
