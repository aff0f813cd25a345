package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Correlated-subquery DECORRELATION (round 8, continuation) — the TPC-H
  * Q17 shape: "lineitems whose quantity is below 20% of their part's
  * average order quantity", i.e. a per-group scalar subquery correlated
  * on the join key. The relational suite covers joins, windows, rollups
  * and semi/anti joins; this adds the remaining classic: a correlated
  * aggregate predicate, written in its DECORRELATED form — compute the
  * per-part aggregate once, join it back, filter — which is exactly the
  * plan a 100 TB engine must reach (the naive form re-aggregates per
  * outer row).
  *
  * Cross-engine exactness (§6): quantities are integer-valued doubles
  * cast to BIGINT through round(); the 20%-of-average threshold is the
  * integer cross-multiplication `5 · qty · cnt_p < sum_p` (avg never
  * materializes as a float); revenue rides as integer cents. The final
  * rollup per brand is all-BIGINT.
  *
  * Scale shape: one map-side-combinable per-part aggregate over the fact
  * table, one partkey-keyed join back (fact×agg — sort-merge on the
  * natural key, bucketing makes it exchange-free per InfraSpec), one
  * broadcast of the part DIM for the brand attribute, then a brand
  * rollup. No window, no correlated re-evaluation.
  */
object AvgFilter {

  def q17AvgFilter(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
      expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)").as("price_cents"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(perPart, Seq("l_partkey"))
      .filter(expr("5 * qty * cnt < sum_qty"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        sum("qty").as("small_qty"),
        sum("price_cents").as("small_revenue_cents"))
      .orderBy("p_brand")
  }

  val q17AvgFilterSql: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |         CAST(round(l_quantity) AS BIGINT) AS qty,
      |         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_cents
      |  FROM lineitem
      |), pp AS (
      |  SELECT l_partkey,
      |         CAST(sum(qty) AS BIGINT) AS sum_qty,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM li GROUP BY 1
      |)
      |SELECT p.p_brand,
      |       CAST(count(*) AS BIGINT) AS n_small,
      |       CAST(sum(li.qty) AS BIGINT) AS small_qty,
      |       CAST(sum(li.price_cents) AS BIGINT) AS small_revenue_cents
      |FROM li
      |JOIN pp ON li.l_partkey = pp.l_partkey
      |JOIN part p ON li.l_partkey = p.p_partkey
      |WHERE 5 * li.qty * pp.cnt < pp.sum_qty
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
}
