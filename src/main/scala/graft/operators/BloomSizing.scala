package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BLOOM-FILTER SIZING report (round 8, continuation 5) — capacity
  * planning for the semi-join reduction dial the dedup family ships
  * ([[ParagraphDedup]]'s `bloomFpp`, and the classic shuffle-join
  * pre-filter): for each join key of the star and each candidate
  * false-positive rate, the exact distinct-key cardinality and the
  * bits / bytes / hash count a Bloom filter of that cardinality
  * needs. The dial's PRICE LIST — "1% fpp on l_orderkey costs 18 KB
  * broadcast" is the number that decision needs, per key, from data.
  *
  * The per-element constants are the standard Bloom optima
  * (m/n = −ln p ⁄ ln²2, k = −log₂ p), precomputed in Scala as
  * integer MILLI-bits-per-element (9585 for 1%, 6236 for 5%) so the
  * SQL is pure BIGINT arithmetic on both engines (SURVEY §6 — no ln
  * in any engine expression; the [[Curation.tfidfTopTerms]] ratio-idf
  * discipline applied to capacity math).
  *
  * Scale shape: ONE lineitem scan computes all three fact-side exact
  * distincts in a single multi-distinct aggregate (the Expand cost is
  * the honest price of exact cardinalities — [[NormalizationFunnel]]'s
  * documented trade; [[CardinalityReport]]'s HLL twin is the
  * approximate dial), one orders scan for o_custkey, a 2×4-row
  * constant grid after. Output is 8 rows.
  */
object BloomSizing {

  /** (fpp_pct, milli-bits per element, hash count): 1% and 5% optima. */
  val Fpps: Seq[(Long, Long, Long)] = Seq((1L, 9585L, 7L), (5L, 6236L, 4L))

  def bloomSizingReport(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.agg(
      countDistinct("l_orderkey").as("l_orderkey"),
      countDistinct("l_partkey").as("l_partkey"),
      countDistinct("l_suppkey").as("l_suppkey"))
    val od = orders.agg(countDistinct("o_custkey").as("o_custkey"))
    val keys = li.crossJoin(od).selectExpr(
      """stack(4,
        |  'l_orderkey', l_orderkey, 'l_partkey', l_partkey,
        |  'l_suppkey', l_suppkey, 'o_custkey', o_custkey
        |) AS (join_key, n_distinct)""".stripMargin)
    val fppArr = Fpps.map { case (p, mb, h) =>
      s"struct(CAST($p AS BIGINT) AS p, CAST($mb AS BIGINT) AS mb, CAST($h AS BIGINT) AS h)"
    }.mkString("array(", ", ", ")")
    keys
      .select(col("join_key"), col("n_distinct"), explode(expr(fppArr)).as("f"))
      .select(col("join_key"), col("n_distinct"), col("f.p").as("fpp_pct"),
        expr("(n_distinct * f.mb) div 1000").as("bits"),
        expr("((n_distinct * f.mb) div 1000 + 7) div 8").as("bytes"),
        col("f.h").as("n_hashes"))
  }

  def bloomSizingReportQ(lineitem: DataFrame, orders: DataFrame): DataFrame =
    bloomSizingReport(lineitem, orders).orderBy("join_key", "fpp_pct")

  val bloomSizingReportSql: String = {
    val grid = Fpps.map { case (p, mb, h) =>
      s"""SELECT join_key, n_distinct, CAST($p AS BIGINT) AS fpp_pct,
         |         (n_distinct * $mb) // 1000 AS bits,
         |         ((n_distinct * $mb) // 1000 + 7) // 8 AS bytes,
         |         CAST($h AS BIGINT) AS n_hashes
         |  FROM keys""".stripMargin
    }.mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH li AS (
       |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS l_orderkey,
       |         CAST(count(DISTINCT l_partkey) AS BIGINT) AS l_partkey,
       |         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS l_suppkey
       |  FROM lineitem
       |), od AS (
       |  SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS o_custkey
       |  FROM orders
       |), keys AS (
       |  SELECT 'l_orderkey' AS join_key, l_orderkey AS n_distinct FROM li CROSS JOIN od
       |  UNION ALL SELECT 'l_partkey', l_partkey FROM li
       |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM li
       |  UNION ALL SELECT 'o_custkey', o_custkey FROM od
       |)
       |$grid
       |ORDER BY join_key, fpp_pct""".stripMargin
  }
}
