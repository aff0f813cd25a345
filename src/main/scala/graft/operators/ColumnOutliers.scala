package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-column Tukey-fence OUTLIER screen (round 8, continuation) — the
  * numeric data-quality pass beside [[TableProfile]]'s counts profile:
  * for each numeric lineitem column, exact Q1/Q3/IQR and the row counts
  * outside the 1.5·IQR fences. The arrival-time "does this batch's
  * distribution look sane" gate; [[RobustOutlier]] is the median/MAD
  * per-entity event screen, this is the per-COLUMN relational screen.
  *
  * Cross-engine exactness (§6): values ride as integer cents; Q1/Q3 are
  * rank-selected exact order statistics ([[LengthQuantiles]] — value at
  * row `((n-1)·p) div 100 + 1` is tie-stable because equal values give
  * the same extracted value whichever tied row carries the rank); the
  * fences are evaluated in the DOUBLED integer domain
  * (`2v < 2·q1 − 3·iqr`) so 1.5·IQR never leaves int64 — no float
  * anywhere.
  *
  * Scale shape: the inline stack unpivot ([[TableProfile]]'s one-scan
  * trade) feeds a per-column rank window; the 4-row fence frame joins
  * back broadcast against a second unpivot pass — the documented
  * two-pass exception class ([[Curation.qualitySelect]]): rescanning a
  * 100 TB table beats materializing its unpivoted double. Per-column
  * windows are single-reducer at gate scale; the deployment rewrite is
  * the same histogram/offset form quality_select ships.
  */
object ColumnOutliers {

  /** (column, scale-to-cents) — all rendered as exact integer cents. */
  val Cols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private val stackArgs: String =
    Cols.map(c => s"'$c', CAST(round($c * 100.0) AS BIGINT)").mkString(", ")

  private def unpivot(lineitem: DataFrame): DataFrame =
    lineitem.select(expr(s"stack(${Cols.size}, $stackArgs) AS (col_name, v)"))

  def columnOutliers(lineitem: DataFrame): DataFrame = {
    val per = Window.partitionBy("col_name")
    val ord = Window.partitionBy("col_name").orderBy(col("v"))
    val ranked = unpivot(lineitem)
      .withColumn("n", count(lit(1)).over(per))
      .withColumn("rn", row_number().over(ord))
    val fences = ranked.groupBy("col_name")
      .agg(max("n").as("n_rows"),
        max(when(expr("rn = ((n - 1) * 25) div 100 + 1"), col("v"))).as("q1"),
        max(when(expr("rn = ((n - 1) * 75) div 100 + 1"), col("v"))).as("q3"))
      .withColumn("iqr", expr("q3 - q1"))
    unpivot(lineitem)
      .join(broadcast(fences), Seq("col_name"))
      .groupBy("col_name")
      .agg(max("n_rows").as("n_rows"), max("q1").as("q1"), max("q3").as("q3"),
        max("iqr").as("iqr"),
        coalesce(sum(when(expr("2 * v < 2 * q1 - 3 * iqr"), 1L)), lit(0L)).as("n_low"),
        coalesce(sum(when(expr("2 * v > 2 * q3 + 3 * iqr"), 1L)), lit(0L)).as("n_high"))
      .select(col("col_name"), col("n_rows"), col("q1"), col("q3"), col("iqr"),
        col("n_low"), col("n_high"))
  }

  def columnOutliersQ(lineitem: DataFrame): DataFrame =
    columnOutliers(lineitem).orderBy("col_name")

  val columnOutliersSql: String = {
    val arms = Cols.map(c =>
      s"SELECT '$c' AS col_name, CAST(round($c * 100.0) AS BIGINT) AS v FROM lineitem")
      .mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH u AS (
       |  $arms
       |), ranked AS (
       |  SELECT col_name, v,
       |         CAST(count(*) OVER (PARTITION BY col_name) AS BIGINT) AS n,
       |         CAST(row_number() OVER (PARTITION BY col_name ORDER BY v) AS BIGINT) AS rn
       |  FROM u
       |), fences AS (
       |  SELECT col_name, CAST(max(n) AS BIGINT) AS n_rows,
       |         max(CASE WHEN rn = ((n - 1) * 25) // 100 + 1 THEN v END) AS q1,
       |         max(CASE WHEN rn = ((n - 1) * 75) // 100 + 1 THEN v END) AS q3,
       |         max(CASE WHEN rn = ((n - 1) * 75) // 100 + 1 THEN v END)
       |           - max(CASE WHEN rn = ((n - 1) * 25) // 100 + 1 THEN v END) AS iqr
       |  FROM ranked GROUP BY 1
       |)
       |SELECT u.col_name, f.n_rows, f.q1, f.q3, f.iqr,
       |       CAST(COALESCE(sum(CASE WHEN 2 * u.v < 2 * f.q1 - 3 * f.iqr THEN 1 END), 0) AS BIGINT) AS n_low,
       |       CAST(COALESCE(sum(CASE WHEN 2 * u.v > 2 * f.q3 + 3 * f.iqr THEN 1 END), 0) AS BIGINT) AS n_high
       |FROM u JOIN fences f ON u.col_name = f.col_name
       |GROUP BY u.col_name, f.n_rows, f.q1, f.q3, f.iqr
       |ORDER BY u.col_name""".stripMargin
  }
}
