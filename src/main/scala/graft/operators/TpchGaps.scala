package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining TPC-H decorrelation classics (round 10), adapted to
  * this schema (no partsupp / receipt-commit dates — each query keeps
  * the PLAN SHAPE that makes the original a classic and re-derives its
  * predicate from columns that exist; reference analog: read_gold.py's
  * SQL rollup surface, the same star):
  *
  *  - [[q2MinCostSupplier]] (Q2): correlated scalar MIN per part,
  *    decorrelated to agg + equality join-back. "Cost" = min observed
  *    unit price in cents (per-ROW double division then round — shared
  *    text, no sum-order exposure).
  *  - [[q8MarketShare]] (Q8): two-level share — every supplier nation's
  *    ppm share of yearly revenue inside one customer region × part
  *    type. Integer: cents sums, share = rev·10⁶ div year_total.
  *  - [[q9ProductProfit]] (Q9): profit per supplier nation × order year
  *    over a part-name LIKE; the suite's deepest star (lineitem ⋈
  *    orders ⋈ part ⋈ supplier ⋈ nation). Cost proxy =
  *    retailprice·quantity (no supplycost in schema), exact cents.
  *  - [[q11ImportantParts]] (Q11): HAVING over a GLOBAL scalar
  *    aggregate — parts holding > 1/1000 of total revenue, integer
  *    cross-multiplied, 1-row broadcast fact (the q22 class).
  *  - [[q12ShipDelay]] (Q12): conditional priority counts per shipping
  *    DELAY bucket (integer-µs day arithmetic stands in for the
  *    receipt-vs-commit comparison the schema lacks).
  *  - [[q6ForecastRevenue]] (Q6): the pushdown classic — every
  *    predicate (ship window, discount band, quantity cap) is a plain
  *    scan-pushable comparison; one partial-agg, one row out. The
  *    discount band uses MIDPOINT double literals (0.045/0.075) so the
  *    discrete hundredths grid decides each row identically in both
  *    engines with no round() blocking pushdown.
  *  - [[q20PartPromotion]] (Q20): the nested-subquery classic —
  *    suppliers who shipped a strict majority of some filtered part's
  *    volume in the window, semi-joined to a nation-filtered supplier
  *    list. Engine side decorrelates the correlated scalar
  *    (per-part total) to one window; the ORACLE keeps the correlated
  *    IN + scalar-subquery form — agreement proves the decorrelation.
  *  - [[q16SupplierVariety]] (Q16): DISTINCT supplier counts per
  *    (brand, type, size) with an excluded brand — the distinct-agg
  *    after join shape.
  *  - [[q21SoleDelay]] (Q21): the double-correlated EXISTS / NOT EXISTS
  *    classic — the supplier whose last shipment STRICTLY trails every
  *    other supplier's on a multi-supplier order. Engine side
  *    decorrelates to one (order, supplier) aggregation + one window
  *    over order (max, count-at-max, supplier count); the ORACLE keeps
  *    the correlated EXISTS/NOT-EXISTS form — agreement proves the
  *    decorrelation.
  *
  * Exactness (SURVEY §6): money in integer cents (per-row round then
  * BIGINT sum — [[TopSupplier]]'s rule), calendar fields via the
  * µs-truncated timestamp ([[TradeVolume]]'s year rule), shares as
  * integer ppm divisions, unique ORDER BY tie-breaks everywhere.
  */
object TpchGaps {

  private val RevCents =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)"

  // ----------------------------------------------------------- Q2 shape

  def q2MinCostSupplier(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, nation: DataFrame): DataFrame = {
    // the correlated min-cost subquery decorrelated as a WINDOW-min over
    // the (part, supp) aggregate — one consumer of `cost`, so no
    // localCheckpoint is needed (the groupBy+join-back form read the
    // lineitem aggregation twice); the oracle keeps the two-CTE
    // subquery form, so agreement proves the decorrelation
    val cost = lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice / l_quantity * 100.0) AS BIGINT)").as("unit_cents"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("unit_cents").as("min_unit_cents"))
    cost
      .withColumn("best_cents", min("min_unit_cents")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")))
      .filter(col("min_unit_cents") === col("best_cents"))
      .join(broadcast(part.filter(col("p_size") >= 30)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("s_acctbal"), col("min_unit_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2MinCostSupplierSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |         min(CAST(round(l_extendedprice / l_quantity * 100.0) AS BIGINT)) AS min_unit_cents
      |  FROM lineitem GROUP BY 1, 2
      |), best AS (
      |  SELECT l_partkey, min(min_unit_cents) AS best_cents FROM cost GROUP BY 1
      |)
      |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal, min_unit_cents
      |FROM cost
      |JOIN best USING (l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE min_unit_cents = best_cents AND p_size >= 30
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // ----------------------------------------------------------- Q8 shape

  def q8MarketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                    part: DataFrame): DataFrame = {
    val base = region.filter(col("r_name") === "ASIA")
      .join(broadcast(nation), col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part.filter(col("p_type") === "STANDARD")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.withColumnRenamed("s_nationkey", "sn_key")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key2"),
        col("n_name").as("supp_nation"))), col("sn_key") === col("sn_key2"))
      .select(
        expr("CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)").as("o_year"),
        col("supp_nation"), expr(RevCents).as("cents"))
    val agg = base.groupBy("o_year", "supp_nation")
      .agg(sum("cents").as("rev_cents"))
    val perYear = Window.partitionBy("o_year")
    agg.withColumn("year_total", sum(col("rev_cents")).over(perYear))
      .withColumn("share_ppm", expr("(rev_cents * 1000000) div year_total"))
      .select(col("o_year"), col("supp_nation"), col("rev_cents"), col("share_ppm"))
      .orderBy("o_year", "supp_nation")
  }

  val q8MarketShareSql: String =
    s"""WITH base AS (
       |  SELECT CAST(year(date_trunc('microseconds', o_orderdate)) AS BIGINT) AS o_year,
       |         sn.n_name AS supp_nation,
       |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents
       |  FROM region
       |  JOIN nation cn ON cn.n_regionkey = r_regionkey
       |  JOIN customer ON c_nationkey = cn.n_nationkey
       |  JOIN orders ON o_custkey = c_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON sn.n_nationkey = s_nationkey
       |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
       |), agg AS (
       |  SELECT o_year, supp_nation, CAST(sum(cents) AS BIGINT) AS rev_cents
       |  FROM base GROUP BY 1, 2
       |)
       |SELECT o_year, supp_nation, rev_cents,
       |       (rev_cents * 1000000) // CAST(sum(rev_cents) OVER (PARTITION BY o_year) AS BIGINT) AS share_ppm
       |FROM agg
       |ORDER BY o_year, supp_nation""".stripMargin

  // ----------------------------------------------------------- Q9 shape

  def q9ProductProfit(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                      supplier: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_name").like("%widget%"))),
        col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("supp_nation"),
        expr("CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)").as("o_year"),
        (expr(RevCents) -
          expr("CAST(round(p_retailprice * l_quantity * 100.0) AS BIGINT)")).as("profit_cents"))
      .groupBy("supp_nation", "o_year")
      .agg(sum("profit_cents").as("profit_cents"))
      .orderBy("supp_nation", "o_year")

  val q9ProductProfitSql: String =
    """SELECT n_name AS supp_nation,
      |       CAST(year(date_trunc('microseconds', o_orderdate)) AS BIGINT) AS o_year,
      |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
      |                - CAST(round(p_retailprice * l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS profit_cents
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2
      |ORDER BY supp_nation, o_year""".stripMargin

  // ---------------------------------------------------------- Q11 shape

  def q11ImportantParts(lineitem: DataFrame): DataFrame = {
    // |parts|-sized agg consumed TWICE (1-row total + the threshold
    // filter) — checkpoint per the multi-consumer invariant, or the
    // lineitem aggregation runs once per consumer
    val value = lineitem
      .select(col("l_partkey"), expr(RevCents).as("cents"))
      .groupBy("l_partkey").agg(sum("cents").as("value_cents"))
      .localCheckpoint()
    val tot = value.agg(sum("value_cents").as("total_cents"),
      count(lit(1)).as("n_parts"))
    // threshold = the MEAN part value (integer cross-multiplied, ≥ so the
    // cut is non-vacuous on ANY distribution — max ≥ mean; TPC-H's fixed
    // 1/1000 fraction is vacuous on this generator's uniform prices)
    value.crossJoin(broadcast(tot))
      .filter(expr("value_cents * n_parts >= total_cents"))
      .select(col("l_partkey").as("p_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("p_partkey"))
  }

  val q11ImportantPartsSql: String =
    """WITH v AS (
      |  SELECT l_partkey,
      |         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
      |  FROM lineitem GROUP BY 1
      |), t AS (
      |  SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
      |         CAST(count(*) AS BIGINT) AS n_parts
      |  FROM v
      |)
      |SELECT l_partkey AS p_partkey, value_cents
      |FROM v CROSS JOIN t
      |WHERE value_cents * n_parts >= total_cents
      |ORDER BY value_cents DESC, p_partkey""".stripMargin

  // ---------------------------------------------------------- Q12 shape

  def q12ShipDelay(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(expr(
        """CASE WHEN (unix_micros(CAST(l_shipdate AS TIMESTAMP))
          |          - unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000 <= 30 THEN '0-30'
          |     WHEN (unix_micros(CAST(l_shipdate AS TIMESTAMP))
          |          - unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000 <= 60 THEN '31-60'
          |     ELSE '61+' END""".stripMargin).as("delay_bucket"),
        col("o_orderpriority"))
      .groupBy("delay_bucket")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("delay_bucket")

  val q12ShipDelaySql: String =
    """SELECT CASE WHEN (epoch_us(date_trunc('microseconds', l_shipdate))
      |               - epoch_us(date_trunc('microseconds', o_orderdate))) // 86400000000 <= 30 THEN '0-30'
      |            WHEN (epoch_us(date_trunc('microseconds', l_shipdate))
      |               - epoch_us(date_trunc('microseconds', o_orderdate))) // 86400000000 <= 60 THEN '31-60'
      |            ELSE '61+' END AS delay_bucket,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |ORDER BY delay_bucket""".stripMargin

  // ----------------------------------------------------------- Q6 shape

  def q6ForecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01'") &&
        col("l_shipdate") < expr("TIMESTAMP '1997-01-01'") &&
        col("l_discount") >= 0.045 && col("l_discount") <= 0.075 &&
        col("l_quantity") < 24.0)
      .agg(
        sum(expr("CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT)"))
          .as("revenue_cents"),
        count(lit(1)).as("n_lines"))

  val q6ForecastRevenueSql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= CAST(0.045 AS DOUBLE) AND l_discount <= CAST(0.075 AS DOUBLE)
      |  AND l_quantity < CAST(24 AS DOUBLE)""".stripMargin

  // ---------------------------------------------------------- Q20 shape

  def q20PartPromotion(lineitem: DataFrame, part: DataFrame,
                       supplier: DataFrame, nation: DataFrame): DataFrame = {
    val shipped = lineitem
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01'") &&
        col("l_shipdate") < expr("TIMESTAMP '1997-01-01'"))
      .join(broadcast(part.filter(col("p_name").like("%rod%"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("q").as("sq"))
    val perPart = Window.partitionBy("l_partkey")
    val dominant = shipped
      .withColumn("tq", sum(col("sq")).over(perPart))
      .filter(col("sq") * 2 > col("tq"))
      .select("l_suppkey").distinct()
    supplier
      .join(broadcast(nation.filter(col("n_name").like("NATION_1%"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_name", "s_suppkey")
  }

  /** Oracle keeps Q20's nested correlated form (IN + correlated scalar
    * subquery) — agreement proves the engine's window decorrelation. */
  val q20PartPromotionSql: String =
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey,
      |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%rod%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2
      |)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name LIKE 'NATION_1%'
      |  AND s_suppkey IN (
      |    SELECT a.l_suppkey FROM shipped a
      |    WHERE 2 * a.sq > (SELECT sum(b.sq) FROM shipped b
      |                      WHERE b.l_partkey = a.l_partkey))
      |ORDER BY s_name, s_suppkey""".stripMargin

  // ---------------------------------------------------------- Q16 shape

  def q16SupplierVariety(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_brand") =!= "Brand#45" &&
        col("p_type") =!= "PROMO")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  val q16SupplierVarietySql: String =
    """SELECT p_brand, p_type, p_size,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------- Q21 shape

  def q21SoleDelay(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val perOS = lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("ship_us"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max("ship_us").as("ms"))
    val perO = Window.partitionBy("l_orderkey")
    val flagged = perOS
      .withColumn("n_supp", count(lit(1)).over(perO))
      .withColumn("max_all", max(col("ms")).over(perO))
      .withColumn("cnt_at_max",
        sum(when(col("ms") === col("max_all"), 1L).otherwise(0L)).over(perO))
      .filter(col("n_supp") >= 2 && col("ms") === col("max_all") &&
        col("cnt_at_max") === 1)
    flagged.groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(100)
  }

  /** Oracle keeps the CORRELATED double-EXISTS form — agreement proves
    * the window decorrelation above. */
  val q21SoleDelaySql: String =
    """WITH per_os AS (
      |  SELECT l_orderkey, l_suppkey,
      |         max(epoch_us(date_trunc('microseconds', l_shipdate))) AS ms
      |  FROM lineitem GROUP BY 1, 2
      |), sole AS (
      |  SELECT a.l_orderkey, a.l_suppkey
      |  FROM per_os a
      |  WHERE EXISTS (SELECT 1 FROM per_os b
      |                WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM per_os b
      |                    WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey
      |                      AND b.ms >= a.ms)
      |)
      |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM sole JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1, 2
      |ORDER BY numwait DESC, s_suppkey
      |LIMIT 100""".stripMargin
}
