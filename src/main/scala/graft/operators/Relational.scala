package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational capabilities (SURVEY.md §2.B).
  *
  * The reference drives every pipeline stage through DataFrame
  * scan/filter/groupBy/window/join ops (e.g. /root/reference/main/gold.py:40-81,
  * /root/reference/read_gold.py:38-54); these queries exercise the same engine
  * surface on the TPC-H-ish tables.
  *
  * Oracle parity rules (SURVEY.md §6): identical aliases both sides, doubles
  * rounded on both sides, deterministic ORDER BY with tie-breaks.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** Pricing summary: groupBy-agg with computed measures (TPC-H Q1 shape). */
  def q1Agg(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      | round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_extendedprice), 4) AS avg_price,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority top-10: 3-way join + agg + ordered limit (Q3 shape).
    * orders and customer are small relative to lineitem at scale: customer
    * side is broadcastable; Catalyst/AQE picks broadcast for the dim side.
    */
  def q3TopK(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    customer
      .filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < ts("1998-01-01"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > ts("1998-01-01"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  val q3TopKSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Local-supplier revenue: 6-way star join (Q5 shape). region/nation/
    * supplier/customer are classic broadcast dims; lineitem⋈orders is the
    * one genuine shuffle at scale.
    */
  def q5MultiJoin(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  orders: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame =
    region.filter(col("r_name") === "ASIA")
      .join(broadcast(nation), col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  val q5MultiJoinSql: String =
    """SELECT n_name,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Top-3 orders by price per priority class: rank-per-group window. */
  def windowTopKPerGroup(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_orderpriority", "rn")
  }

  val windowTopKPerGroupSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  /** Hierarchical totals via ROLLUP (partial-agg friendly). */
  def rollupAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  val rollupAggSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** EXISTS / NOT EXISTS tagging in ONE pass: left join against the distinct
    * big-order customer keys + null-test, instead of left_semi + left_anti
    * over the same inputs (which scans customer and orders twice). Mirrors
    * the reference's skip-if-exists ingest check (bronze-to-silver.py:49-54,74). */
  def semiAntiJoin(customer: DataFrame, orders: DataFrame): DataFrame = {
    val bigCust = orders.filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey")).distinct()
    customer.join(bigCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        when(col("o_custkey").isNotNull, "has_big_order")
          .otherwise("no_big_order").as("tag"))
      .orderBy("c_custkey", "tag")
  }

  val semiAntiJoinSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey, c_name, 'has_big_order' AS tag FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |  UNION ALL
      |  SELECT c_custkey, c_name, 'no_big_order' AS tag FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |) t ORDER BY c_custkey, tag""".stripMargin

  /** Incremental ingest: new keys = incoming ∖ existing (left-anti), the
    * set-difference form of the reference's object_exists skip loop
    * (bronze-to-silver.py:66-91). Parts with no shipment in Jan 1997. */
  def incrementalNewKeys(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val existing = lineitem
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1997-02-01"))
      .select(col("l_partkey"))
    part.join(existing, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy("p_partkey")
  }

  val incrementalNewKeysSql: String =
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey
      |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01')
      |ORDER BY p_partkey""".stripMargin

  /** JSON property extraction + agg over the extracted field. */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_bucket", floor(col("k") / lit(10)).cast("int"))
      .groupBy("event_type", "k_bucket")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type", "k_bucket")

  val jsonExtractSql: String =
    """SELECT event_type,
      |       CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10) AS INT) AS k_bucket,
      |       count(*) AS n,
      |       round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY event_type, k_bucket
      |ORDER BY event_type, k_bucket""".stripMargin

  /** Tumbling-window counts: batch twin of the Structured Streaming job
    * (streaming spec drives the readStream/watermark version). */
  def streamingWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("window_start", "event_type")

  val streamingWindowAggSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin
}
