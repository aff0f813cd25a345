package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence FUNNEL analytics (round 8, continuation) — the
  * strictly-ordered first-completion conversion funnel (view → click →
  * purchase) over the events stream: the per-user product-analytics query
  * the B-family (sessionize #18, as-of #19) doesn't cover, and the same
  * shape an EEG protocol-compliance check takes (stimulus → response →
  * confirmation per trial; the reference's events are exactly such
  * per-trial streams, read_gold.py:38-54's flag rollups being the
  * unordered cousin).
  *
  * Semantics: t₁ = first 'view'; t₂ = first 'click' STRICTLY after t₁;
  * t₃ = first 'purchase' strictly after t₂ — each stage only counts if
  * reached after the previous one (a purchase before any view is not a
  * conversion), the standard strict-sequence funnel. A user missing stage
  * k has NULL from k on; `stage_reached` counts completed prefixes;
  * `converted` = full path. All time math is integer microseconds (§6:
  * unix_micros / epoch_us; raw ts never output).
  *
  * Scale shape: ONE hash exchange on user_id feeds three CHAINED
  * conditional-min windows (t₂'s predicate references t₁ — legal because
  * t₁ is itself a window value over the SAME partitioning, so Catalyst
  * stacks all three Window operators over one exchange, spec-pinned) and
  * the closing per-user aggregate reuses the same partitioning (partial
  * agg on already-clustered data). No join, no collect; output is
  * |users| rows. The sequential dependency that looks iterative (each
  * stage's window reads the previous stage's result) compiles to a
  * LINEAR operator chain, not a loop — depth = #stages, fixed.
  */
object Funnel {

  /** The ordered stage list — a funnel definition, not a data constant. */
  val Stages: Seq[String] = Seq("view", "click", "purchase")

  def eventFunnel(events: DataFrame, stages: Seq[String] = Stages): DataFrame = {
    require(stages.nonEmpty)
    val w = Window.partitionBy("user_id")
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("t_us"))
    val withStages = stages.zipWithIndex.foldLeft(base) { case (df, (st, i)) =>
      val cond =
        if (i == 0) s"event_type = '$st'"
        else s"event_type = '$st' AND t_us > t${i - 1}_us"
      df.withColumn(s"t${i}_us", min(expr(s"CASE WHEN $cond THEN t_us END")).over(w))
    }
    // the t_i columns are per-user constants; min() is the identity pick
    val aggCols = stages.indices.map(i => min(col(s"t${i}_us")).as(s"t${i}_us"))
    val renamed = withStages.groupBy("user_id")
      .agg(aggCols.head, aggCols.tail: _*)
    val stageExpr = stages.indices.reverse
      .map(i => s"WHEN t${i}_us IS NOT NULL THEN ${i + 1}")
      .mkString("CASE ", " ", " ELSE 0 END")
    renamed
      .withColumn("stage_reached", expr(s"CAST(($stageExpr) AS INT)"))
      .withColumn("converted", col(s"t${stages.size - 1}_us").isNotNull)
  }

  def eventFunnelQ(events: DataFrame): DataFrame =
    eventFunnel(events)
      .select(col("user_id"), col("t0_us"), col("t1_us"), col("t2_us"),
        col("stage_reached"), col("converted"))
      .orderBy("user_id")

  /** DuckDB twin: identical chained conditional-min windows. */
  val eventFunnelSql: String = {
    val stageCase = Stages.indices.reverse
      .map(i => s"WHEN t${i}_us IS NOT NULL THEN ${i + 1}")
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH base AS (
       |  SELECT user_id, event_type,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us
       |  FROM events
       |), s0 AS (
       |  SELECT *, min(CASE WHEN event_type = '${Stages(0)}' THEN t_us END)
       |              OVER (PARTITION BY user_id) AS t0_us
       |  FROM base
       |), s1 AS (
       |  SELECT *, min(CASE WHEN event_type = '${Stages(1)}' AND t_us > t0_us THEN t_us END)
       |              OVER (PARTITION BY user_id) AS t1_us
       |  FROM s0
       |), s2 AS (
       |  SELECT *, min(CASE WHEN event_type = '${Stages(2)}' AND t_us > t1_us THEN t_us END)
       |              OVER (PARTITION BY user_id) AS t2_us
       |  FROM s1
       |), agg AS (
       |  SELECT user_id, min(t0_us) AS t0_us, min(t1_us) AS t1_us, min(t2_us) AS t2_us
       |  FROM s2 GROUP BY user_id
       |)
       |SELECT user_id, t0_us, t1_us, t2_us,
       |       CAST(($stageCase) AS INT) AS stage_reached,
       |       t2_us IS NOT NULL AS converted
       |FROM agg
       |ORDER BY user_id""".stripMargin
  }
}
