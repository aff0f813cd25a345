package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column PROFILING report (round 8, continuation) — the data-quality
  * pass a lake runs on arrival, before any query logic: per-column row
  * count, NULL count, exact distinct cardinality and min/max. One row
  * per column, computed in ONE scan via an inline unpivot (stack), not
  * |columns| separate scans — at 100 TB the difference between one pass
  * and five. [[CardinalityReport]] inventories ONE table's key columns
  * with HLL twins; this is the generic any-table profile shape.
  *
  * Cross-engine exactness (§6): the profiled columns are restricted to
  * BIGINT and VARCHAR — their string renderings are identical across
  * engines (no double/timestamp formatting divergence); min/max are
  * taken on the TYPED value and rendered to string afterwards, so
  * numeric columns compare numerically (min "1" not "1,10,100"
  * lexicographic). Counts are BIGINTs.
  *
  * Scale shape: one scan, one inline stack() generator (the Generate
  * child is the expression), one map-side-combinable (column, value)
  * pre-aggregate for distincts feeding a catalog-sized (column) rollup.
  * NULLs ride the unpivot as NULL values (stack preserves them) and are
  * counted, not dropped. Output is |columns| rows.
  */
object TableProfile {

  /** (name, typed-string-expression) pairs — BIGINT columns rendered via
    * CAST only for the min/max display, compared as typed values. */
  val LineitemCols: Seq[(String, Boolean)] = Seq(
    ("l_orderkey", true), ("l_partkey", true), ("l_suppkey", true),
    ("l_returnflag", false), ("l_linestatus", false))

  /** Strip the numeric columns' zero padding for display — only for
    * numeric columns (a string value may legitimately start with '0'),
    * with a '0' fallback for the all-zeros key. Shared text both
    * engines (nullif/coalesce are dialect-common). */
  private def display(cols: Seq[(String, Boolean)], f: String): String = {
    val numeric = cols.filter(_._2).map(c => s"'${c._1}'")
    if (numeric.isEmpty) f
    else s"CASE WHEN col_name IN (${numeric.mkString(", ")}) " +
      s"THEN coalesce(nullif(trim(LEADING '0' FROM $f), ''), '0') ELSE $f END"
  }

  def tableProfile(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame = {
    // numeric columns are zero-padded to width 20 so string min/max
    // equals numeric min/max (nonnegative keys); strings pass through
    def render(c: String, num: Boolean): String =
      if (num) s"lpad(CAST($c AS STRING), 20, '0')" else c
    val stackArgs = cols
      .map { case (c, num) => s"'$c', ${render(c, num)}" }
      .mkString(", ")
    df.select(expr(s"stack(${cols.size}, $stackArgs) AS (col_name, val)"))
      .groupBy("col_name", "val").agg(count(lit(1)).as("c"))
      .groupBy("col_name")
      .agg(
        sum("c").as("n_rows"),
        coalesce(sum(when(col("val").isNull, col("c"))), lit(0L)).as("n_nulls"),
        count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
        expr(display(cols, "min(val)")).as("min_val"),
        expr(display(cols, "max(val)")).as("max_val"))
      .orderBy("col_name")
  }

  def tableProfileQ(lineitem: DataFrame): DataFrame =
    tableProfile(lineitem, LineitemCols)

  val tableProfileSql: String = {
    val arms = LineitemCols.map { case (c, num) =>
      val v = if (num) s"lpad(CAST($c AS VARCHAR), 20, '0')" else c
      s"SELECT '$c' AS col_name, $v AS val FROM lineitem"
    }.mkString("\n      |  UNION ALL\n      |  ")
    s"""WITH u AS (
       |  $arms
       |), g AS (
       |  SELECT col_name, val, CAST(count(*) AS BIGINT) AS c
       |  FROM u GROUP BY 1, 2
       |)
       |SELECT col_name,
       |       CAST(sum(c) AS BIGINT) AS n_rows,
       |       CAST(COALESCE(sum(CASE WHEN val IS NULL THEN c END), 0) AS BIGINT) AS n_nulls,
       |       CAST(count(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
       |       ${display(LineitemCols, "min(val)")} AS min_val,
       |       ${display(LineitemCols, "max(val)")} AS max_val
       |FROM g
       |GROUP BY col_name
       |ORDER BY col_name""".stripMargin
  }
}
