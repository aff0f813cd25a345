package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RETURNED-ITEM EXPOSURE (round 8, continuation 5) — the TPC-H Q10
  * shape: customers ranked by revenue on RETURNED line items in a
  * quarter — who is sending the most money back, the report a returns
  * team opens every morning. Same decorrelated-classic family as
  * #158/#170; the distinguishing plan feature is the flag+window
  * filter reaching the lineitem SCAN (PushedFilters — the scan reads
  * only 'R' rows, ~a quarter of a quarter of the fact table) before
  * the orderkey join, then a customer rollup and top-K.
  *
  * Cross-engine exactness (SURVEY §6): exact cents revenue; integer-µs
  * order-date window ([[TopSupplier]]'s bounds discipline, on
  * o_orderdate); (revenue DESC, custkey) total rank order.
  *
  * Scale shape: flag filter pushed to the scan (spec-pinned), orderkey
  * fact join AFTER both sides are reduced (flagged lines, windowed
  * orders), customer + nation broadcast, TakeOrderedAndProject top-K
  * (no global sort).
  */
object ReturnedItems {

  val TopK = 20
  /** [1997-01-01, 1997-07-01) in epoch-µs — two quarters of orders. */
  val WindowStartUs = 852076800000000L
  val WindowEndUs   = 867715200000000L

  def q10ReturnedTopK(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                      nation: DataFrame): DataFrame = {
    val flagged = lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
          .as("cents"))
    val win = orders
      .filter(expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) >= $WindowStartUs") &&
        expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) < $WindowEndUs"))
      .select("o_orderkey", "o_custkey")
    flagged.join(win, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("cents").as("returned_cents"), count(lit(1)).as("n_lines"))
      .join(broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        col("returned_cents"), col("n_lines"))
      .orderBy(col("returned_cents").desc, col("c_custkey"))
      .limit(TopK)
  }

  def q10ReturnedTopKQ(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                       nation: DataFrame): DataFrame =
    q10ReturnedTopK(lineitem, orders, customer, nation)
      .orderBy(col("returned_cents").desc, col("c_custkey"))

  val q10ReturnedTopKSql: String =
    s"""WITH flagged AS (
       |  SELECT l_orderkey,
       |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents
       |  FROM lineitem WHERE l_returnflag = 'R'
       |), win AS (
       |  SELECT o_orderkey, o_custkey
       |  FROM orders
       |  WHERE epoch_us(date_trunc('microseconds', o_orderdate)) >= $WindowStartUs
       |    AND epoch_us(date_trunc('microseconds', o_orderdate)) < $WindowEndUs
       |), agg AS (
       |  SELECT o_custkey,
       |         CAST(sum(cents) AS BIGINT) AS returned_cents,
       |         CAST(count(*) AS BIGINT) AS n_lines
       |  FROM flagged JOIN win ON l_orderkey = o_orderkey
       |  GROUP BY 1
       |)
       |SELECT c_custkey, c_name, n_name AS nation, returned_cents, n_lines
       |FROM agg
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |ORDER BY returned_cents DESC, c_custkey
       |LIMIT $TopK""".stripMargin
}
