package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TOP SUPPLIER (round 8, continuation 5) — the TPC-H Q15 shape: the
  * supplier(s) achieving MAXIMUM revenue over a 3-month ship window —
  * i.e. an aggregate compared against the MAX OF THE SAME AGGREGATE.
  * Completes the correlated-subquery trio: [[AvgFilter]] (Q17,
  * correlated AVG predicate), [[LateExists]] (Q4, correlated EXISTS),
  * and now the Q15 view-max class — all in their DECORRELATED forms,
  * the plans a 100 TB engine must reach (the naive form re-runs the
  * inner aggregate per outer row).
  *
  * Reference analog: gold-layer "best channel by aggregate" reporting
  * (/root/reference/main/read_gold.py's SQL rollups); re-expressed on
  * the relational star.
  *
  * Cross-engine exactness (SURVEY §6): per-row cents rounding
  * (`CAST(round(price·(1−disc)·100) AS BIGINT)`) then BIGINT sums —
  * the max-equality join compares exact integers, never floats (a
  * float revenue tie at max would be engine-dependent). Ship window
  * is integer-µs bounds ([[LateExists]] discipline).
  *
  * Scale shape: one map-side-combinable suppkey aggregation collapses
  * lineitem; the max is a 1-row broadcast fact (the documented
  * broadcast-fact nested-loop class); the supplier dim join broadcasts
  * (catalog-sized). No window, no re-aggregation, no correlated
  * re-scan — spec pins the single data-scaled exchange.
  */
object TopSupplier {

  /** [1997-01-01, 1997-04-01) in epoch-µs (UTC session). */
  val WindowStartUs = 852076800000000L
  val WindowEndUs   = 859852800000000L

  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) >= $WindowStartUs") &&
        expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) < $WindowEndUs"))
      .select(col("l_suppkey"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
          .as("cents"))
      .groupBy("l_suppkey")
      .agg(sum("cents").as("total_revenue_cents"))
    val mx = rev.agg(max("total_revenue_cents").as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue_cents") === col("max_rev"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
  }

  def topSupplierQ(lineitem: DataFrame, supplier: DataFrame): DataFrame =
    topSupplier(lineitem, supplier).orderBy("s_suppkey")

  val topSupplierSql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT)
       |           AS total_revenue_cents
       |  FROM lineitem
       |  WHERE epoch_us(date_trunc('microseconds', l_shipdate)) >= $WindowStartUs
       |    AND epoch_us(date_trunc('microseconds', l_shipdate)) < $WindowEndUs
       |  GROUP BY 1
       |), mx AS (
       |  SELECT max(total_revenue_cents) AS max_rev FROM rev
       |)
       |SELECT s_suppkey, s_name, total_revenue_cents
       |FROM rev CROSS JOIN mx
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue_cents = max_rev
       |ORDER BY s_suppkey""".stripMargin
}
