package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Cross-engine float parity helpers (SURVEY.md §6).
  *
  * Spark's round(x, d) goes through BigDecimal HALF_UP on the exact decimal
  * expansion while DuckDB computes round(x·10^d)/10^d in floating point —
  * they disagree whenever the true value sits on a .5·10^-d boundary. Both
  * sides therefore use the explicit `round(x * 10^d) / 10^d` text (scale-0
  * round agrees across engines on every double); `+ 0.0` normalizes -0.0.
  */
private[graft] object Parity {
  def pow10(d: Int): String = "1" + "0" * d + ".0"

  def rexpr(x: String, d: Int): String =
    s"round($x * ${pow10(d)}) / ${pow10(d)} + 0.0"

  /** Spark column: x rounded to d decimals, engine-stable, aliased c. */
  def r(c: String, d: Int): Column = expr(rexpr(c, d)).as(c)

  /** SQL select-list twin of [[r]]. */
  def rsql(x: String, d: Int, alias: String): String =
    s"${rexpr(x, d)} AS $alias"
}
