package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VALUE-CONCENTRATION REPORT (round 8, continuation 5) — per event
  * type, how concentrated the value mass is across users: top-1% /
  * top-10% user share and an exact Gini coefficient. The
  * inequality readout behind [[ContributionCap]]'s anti-whale bound
  * and [[KeySkew]]'s join-side twin: cap/salt dials are chosen by
  * exactly this curve ("3 users are 80% of purchase value" is a
  * skew fact AND a product fact).
  *
  * Cross-engine exactness (SURVEY §6):
  *  - per-user mass is exact BIGINT cents; top-share numerators are
  *    conditional sums under a rank cut (`row_number` by
  *    (mass DESC, user_id) — total order), shares integer ppm.
  *  - Gini is computed over the ppm-QUANTIZED distribution
  *    (`x_i = mass·10⁶ div total`, the [[SourceDivergence]]
  *    discipline): with ranks i ascending by (mass, user_id),
  *    `gini_pm = (2·Σi·x − (n+1)·Σx)·1000 div (n·Σx)` — pure
  *    BIGINT. Quantizing BEFORE the rank products bounds every
  *    intermediate: Σi·x ≤ n·10⁶, so ·1000 stays under 2⁶³ up to
  *    n = 10⁹ users per type (raw-cents cross products would
  *    overflow at n·total ≈ 10²⁴). The numerator is provably ≥ 0
  *    (ascending order maximizes Σi·x), so Spark `div` (truncate)
  *    and DuckDB `//` (floor) agree.
  *
  * Scale shape: one events-scale (type, user) aggregation collapses
  * the stream first; the four windows (count, total, two rank
  * orders) all partition by event_type over the collapsed frame and
  * share ONE type exchange (spec-pinned); the final rollup is
  * |types|-sized. Per-type user counts are the one skew axis — the
  * [[Curation.qualitySelect]] histogram rewrite is the dial if a
  * single type's user set outgrows a partition.
  */
object Concentration {

  def concentrationReport(events: DataFrame): DataFrame = {
    val mass = events
      .select(col("event_type"), col("user_id"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      .groupBy("event_type", "user_id")
      .agg(sum("cents").as("mass"))
    val w = Window.partitionBy("event_type")
    val ranked = mass
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("total", sum("mass").over(w))
      .withColumn("i", row_number().over(w.orderBy(col("mass"), col("user_id"))))
      .withColumn("rd", row_number().over(w.orderBy(col("mass").desc, col("user_id"))))
      .withColumn("x_ppm", expr("(mass * 1000000) div total"))
    ranked.groupBy("event_type")
      .agg(max("n").as("n_users"), max("total").as("total_cents"),
        sum(expr("CASE WHEN rd <= greatest(n div 100, 1) THEN mass ELSE 0 END"))
          .as("top1_mass"),
        sum(expr("CASE WHEN rd <= greatest(n div 10, 1) THEN mass ELSE 0 END"))
          .as("top10_mass"),
        sum(expr("i * x_ppm")).as("ixp"), sum("x_ppm").as("sxp"))
      .select(col("event_type"), col("n_users"), col("total_cents"),
        expr("(top1_mass * 1000000) div total_cents").as("top1_ppm"),
        expr("(top10_mass * 1000000) div total_cents").as("top10_ppm"),
        expr("((2 * ixp - (n_users + 1) * sxp) * 1000) div greatest(n_users * sxp, 1)")
          .as("gini_pm"))
  }

  def concentrationReportQ(events: DataFrame): DataFrame =
    concentrationReport(events).orderBy("event_type")

  val concentrationReportSql: String =
    """WITH mass AS (
      |  SELECT event_type, user_id,
      |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS mass
      |  FROM events GROUP BY 1, 2
      |), ranked AS (
      |  SELECT event_type, mass,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |         CAST(sum(mass) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |         row_number() OVER (PARTITION BY event_type ORDER BY mass, user_id) AS i,
      |         row_number() OVER (PARTITION BY event_type ORDER BY mass DESC, user_id) AS rd
      |  FROM mass
      |), q AS (
      |  SELECT *, (mass * 1000000) // total AS x_ppm FROM ranked
      |), agg AS (
      |  SELECT event_type,
      |         max(n) AS n_users, max(total) AS total_cents,
      |         CAST(sum(CASE WHEN rd <= greatest(n // 100, 1) THEN mass ELSE 0 END) AS BIGINT) AS top1_mass,
      |         CAST(sum(CASE WHEN rd <= greatest(n // 10, 1) THEN mass ELSE 0 END) AS BIGINT) AS top10_mass,
      |         CAST(sum(i * x_ppm) AS BIGINT) AS ixp,
      |         CAST(sum(x_ppm) AS BIGINT) AS sxp
      |  FROM q GROUP BY 1
      |)
      |SELECT event_type, n_users, total_cents,
      |       (top1_mass * 1000000) // total_cents AS top1_ppm,
      |       (top10_mass * 1000000) // total_cents AS top10_ppm,
      |       ((2 * ixp - (n_users + 1) * sxp) * 1000) // greatest(n_users * sxp, 1) AS gini_pm
      |FROM agg
      |ORDER BY event_type""".stripMargin
}
