package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q13 + Q22 (round 9) — the last two classic decorrelation shapes the
  * relational set lacked (alongside #110 Q17 correlated-AVG, #143 Q4
  * EXISTS, #158 Q15 max-of-agg, #170 Q18 HAVING-on-child):
  *
  *  - [[q13CustDist]] — TPC-H Q13: the DISTRIBUTION of per-customer
  *    order counts INCLUDING the zero bucket. The zero bucket is the
  *    whole point: a plain groupBy over orders can never see customers
  *    with no orders, so the decorrelated form is orders collapsed per
  *    custkey THEN a LEFT join from customer with COALESCE(n, 0) — the
  *    outer-join-then-histogram plan a naive COUNT-subquery-per-customer
  *    misses.
  *  - [[q22NoOrderCusts]] — TPC-H Q22 shape: per nation (standing in for
  *    the phone country code this schema doesn't carry), customers whose
  *    balance exceeds the average POSITIVE balance and who placed no
  *    RECENT order (the [[RecencyCutoff]] window — Q22's actual filter)
  *    — a scalar-aggregate threshold feeding an ANTI join.
  *
  * Cross-engine exactness (SURVEY §6): balances in exact cents; the
  * "above average positive balance" predicate is the #110 Q17
  * integer-cross-multiplication rule — `bal_cents · n_pos >
  * sum_pos_cents` — so no division ever happens and the cut is
  * bit-identical in both engines. Counts are BIGINTs.
  *
  * Scale shape: Q13 is one map-side-combinable orderkey→custkey count,
  * one custkey-keyed LEFT join (customer is the probe side; at 100 TB
  * both sides shuffle on custkey — no broadcast of a fact), and a
  * |distinct counts|-sized final rollup. Q22 is one combinable
  * (n_pos, sum_pos) 1-row fact on the documented broadcast-fact nested
  * loop, a LEFT-ANTI join against the collapsed orders custkey set
  * (distinct-before-anti, the #167 coverage_audit rule), and a
  * |nations|-sized rollup.
  */
object CustDistribution {

  def q13CustDist(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    customer.select("c_custkey")
      .join(perCust, Seq("c_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  def q13CustDistQ(customer: DataFrame, orders: DataFrame): DataFrame =
    q13CustDist(customer, orders)
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13CustDistSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey AS c_custkey, CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1
      |)
      |SELECT COALESCE(n_orders, 0) AS c_count,
      |       CAST(count(*) AS BIGINT) AS custdist
      |FROM customer LEFT JOIN per_cust USING (c_custkey)
      |GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q22's actual filter is RECENCY ("has not placed an order in N
    * years"), not lifetime orderlessness — and on this data that
    * faithfulness is also what keeps the gate non-vacuous (every gate-SF
    * customer has SOME lifetime order; 2/14/148 qualify at the cutoff
    * at sf0.001/0.01/0.1 — measured). The cutoff is a planted constant so both
    * engines compare the same literal. */
  val RecencyCutoff = "1999-01-01"

  def q22NoOrderCusts(customer: DataFrame, orders: DataFrame): DataFrame = {
    // `cust` feeds two consumers (the 1-row average fact + the probe) BY
    // DESIGN without a checkpoint: it is a pure column projection over
    // the base scan, so each consumer is one pushed-down map pass — the
    // qualitySelect two-pass exception (materializing a table-wide frame
    // to save a map pass is the wrong trade at 100 TB)
    val cust = customer.select(col("c_custkey"), col("c_nationkey"),
      expr("CAST(round(c_acctbal * 100.0) AS BIGINT)").as("bal_cents"))
    val avgFact = cust.filter(col("bal_cents") > 0)
      .agg(count(lit(1)).as("n_pos"), sum("bal_cents").as("sum_pos_cents"))
    // recency filter BEFORE the distinct — pushed to the orders scan
    val hasRecent = orders
      .filter(expr(s"CAST(o_orderdate AS DATE) >= DATE '$RecencyCutoff'"))
      .select(col("o_custkey").as("c_custkey")).distinct()
    cust
      .crossJoin(broadcast(avgFact))
      // above-average predicate without division: bal > sum/n ⟺ bal·n > sum
      .filter(expr("bal_cents * n_pos > sum_pos_cents"))
      .join(hasRecent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("totacctbal_cents"))
  }

  def q22NoOrderCustsQ(customer: DataFrame, orders: DataFrame): DataFrame =
    q22NoOrderCusts(customer, orders).orderBy("c_nationkey")

  val q22NoOrderCustsSql: String =
    s"""WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
      |  FROM customer
      |), f AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pos,
      |         CAST(sum(bal_cents) AS BIGINT) AS sum_pos_cents
      |  FROM cust WHERE bal_cents > 0
      |)
      |SELECT c_nationkey,
      |       CAST(count(*) AS BIGINT) AS numcust,
      |       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
      |FROM cust CROSS JOIN f
      |WHERE bal_cents * n_pos > sum_pos_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND CAST(o_orderdate AS DATE) >= DATE '$RecencyCutoff')
      |GROUP BY 1
      |ORDER BY c_nationkey""".stripMargin
}
