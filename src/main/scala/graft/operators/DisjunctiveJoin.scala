package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DISJUNCTIVE-PREDICATE JOIN (round 8, continuation 5) — the TPC-H
  * Q19 shape: revenue matching an OR of (brand × size-band ×
  * quantity-band) conjunctions — the predicate form rule-based
  * pricing/compliance queries actually take. The plan point: the
  * disjunction must run as a RESIDUAL on one hash join (equi key
  * p_partkey extracted from every branch), not as a nested loop and
  * not as three scans unioned — and each side's single-side OR terms
  * reduce that side BEFORE the join: the part brand/size OR pushes
  * into its parquet scan (plain columns — spec-pinned), the quantity
  * band OR runs map-side on the derived deci column (a computed key
  * can't reach the scan; it still cuts the join's probe volume).
  * Output is per-branch: each conjunction's
  * line count and revenue plus the total (branches are disjoint by
  * brand, so the total is also the OR's mass).
  *
  * Cross-engine exactness (SURVEY §6): quantities in deci-units
  * ([[CubeAgg]]'s rule) with inclusive integer bands, exact cents,
  * branch labels literal strings.
  *
  * Scale shape: one lineitem scan (quantity OR-band filter pushed),
  * part broadcast with its own brand/size OR filter pushed, residual
  * CASE evaluated map-side on the joined rows, ≤ |branches| rows out.
  */
object DisjunctiveJoin {

  /** (label, brand, size lo-hi, deci-quantity lo-hi). */
  val Branches: Seq[(String, String, Int, Int, Long, Long)] = Seq(
    ("small_b2", "Brand#2", 1, 10, 10L, 110L),
    ("mid_b15", "Brand#15", 1, 20, 100L, 250L),
    ("large_b19", "Brand#19", 10, 50, 200L, 500L))

  private def branchCase(qd: String, brand: String, szLo: Int, szHi: Int,
                         qLo: Long, qHi: Long): String =
    s"p_brand = '$brand' AND p_size BETWEEN $szLo AND $szHi " +
      s"AND $qd BETWEEN $qLo AND $qHi"

  def q19Disjunctive(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val qtyOr = Branches.map { case (_, _, _, _, lo, hi) =>
      s"qd BETWEEN $lo AND $hi" }.mkString("(", ") OR (", ")")
    val partOr = Branches.map { case (_, b, slo, shi, _, _) =>
      s"p_brand = '$b' AND p_size BETWEEN $slo AND $shi" }
      .mkString("(", ") OR (", ")")
    val branchExpr = Branches.map { case (lbl, b, slo, shi, qlo, qhi) =>
      s"WHEN ${branchCase("qd", b, slo, shi, qlo, qhi)} THEN '$lbl'"
    }.mkString("CASE ", " ", "ELSE NULL END")
    lineitem
      .select(col("l_partkey"),
        expr("CAST(round(l_quantity * 10.0) AS BIGINT)").as("qd"),
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
          .as("cents"))
      .filter(expr(qtyOr))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"), col("p_size"))
        .filter(expr(partOr))), col("l_partkey") === col("p_partkey"))
      .withColumn("branch", expr(branchExpr))
      .filter(col("branch").isNotNull)
      .groupBy("branch")
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("revenue_cents"))
  }

  def q19DisjunctiveQ(lineitem: DataFrame, part: DataFrame): DataFrame =
    q19Disjunctive(lineitem, part).orderBy("branch")

  val q19DisjunctiveSql: String = {
    val branchExpr = Branches.map { case (lbl, b, slo, shi, qlo, qhi) =>
      s"WHEN ${branchCase("qd", b, slo, shi, qlo, qhi)} THEN '$lbl'"
    }.mkString("CASE ", " ", "ELSE NULL END")
    s"""WITH li AS (
       |  SELECT l_partkey,
       |         CAST(round(l_quantity * 10.0) AS BIGINT) AS qd,
       |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents
       |  FROM lineitem
       |), joined AS (
       |  SELECT $branchExpr AS branch, cents
       |  FROM li JOIN part ON l_partkey = p_partkey
       |)
       |SELECT branch,
       |       CAST(count(*) AS BIGINT) AS n_lines,
       |       CAST(sum(cents) AS BIGINT) AS revenue_cents
       |FROM joined
       |WHERE branch IS NOT NULL
       |GROUP BY 1
       |ORDER BY branch""".stripMargin
  }
}
