package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Market-basket ASSOCIATION RULES over sessions (round 8, continuation)
  * — support / confidence / lift for every unordered event-type pair
  * co-occurring in one session: "users who hit `error` in a session also
  * `purchase` in it?" is the cross-sell / funnel-interference readout
  * product analytics runs on session baskets. [[SessionPath]] ranks
  * ORDERED sequences; this is the order-free itemset view (a pair counts
  * once per session however many times and in whatever order it fires).
  *
  * Cross-engine exactness (§6): support and both confidences are integer
  * ppm (`c · 10⁶ div n`); lift rides the [[Collocations]] discipline —
  * exact int64 cross-product `c_ab · n_sessions`, ONE identically-written
  * CAST-AS-DOUBLE division, ranking-safe because log is monotone.
  *
  * Scale shape: baskets = DISTINCT (user, session, type) — map-side
  * combinable, collapses event volume before anything else; the
  * per-session item array is ≤ |event types| (catalog-sized), so the
  * all-pairs generation inside a session is bounded by |types|² and
  * emitted by an inline nested-transform generator (array already
  * sorted — collect_set + array_sort — so pairs are canonical without
  * least/greatest). The baskets frame feeds three consumers (pair
  * stream, per-type counts, session total) → localCheckpoint per the
  * multi-consumer invariant. The rule joins are catalog×catalog.
  */
object AssocRules {

  /** All ordered-index pairs (i < j) of the SORTED item array — a < b by
    * construction. */
  private val pairArrayExpr: String =
    """flatten(transform(items, (t, i) ->
      |  transform(slice(items, i + 2, greatest(size(items) - i - 1, 0)),
      |    u -> struct(t AS a, u AS b))))""".stripMargin

  def assocRules(events: DataFrame): DataFrame = {
    val baskets = Sessionize.sessionTagged(events)
      .select(col("user_id"), col("session_seq"), col("event_type"))
      .distinct()
      .localCheckpoint()
    val nSess = baskets.select("user_id", "session_seq").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val typeCounts = baskets.groupBy("event_type")
      .agg(count(lit(1)).as("c_one"))
    val pairs = baskets
      .groupBy("user_id", "session_seq")
      .agg(array_sort(collect_set("event_type")).as("items"))
      .select(explode(expr(pairArrayExpr)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    pairs
      .join(typeCounts.select(col("event_type").as("a"), col("c_one").as("c_a")), Seq("a"))
      .join(typeCounts.select(col("event_type").as("b"), col("c_one").as("c_b")), Seq("b"))
      .crossJoin(broadcast(nSess))
      .withColumn("support_ppm", expr("c_ab * 1000000 div n_sessions"))
      .withColumn("conf_a_to_b_ppm", expr("c_ab * 1000000 div c_a"))
      .withColumn("conf_b_to_a_ppm", expr("c_ab * 1000000 div c_b"))
      .withColumn("lift", expr("CAST(c_ab * n_sessions AS DOUBLE) / (c_a * c_b)"))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_sessions"), col("support_ppm"), col("conf_a_to_b_ppm"),
        col("conf_b_to_a_ppm"), r("lift", 4))
  }

  def assocRulesQ(events: DataFrame): DataFrame =
    assocRules(events).orderBy("a", "b")

  /** DuckDB twin: nests [[Sessionize.sessionTagCtes]] verbatim (the
    * shared-CTE convention — the session definition cannot drift), then
    * derives pairs by a baskets self-join (affordable at gate scale;
    * agreement with the sorted-array generator is the canonicalization
    * test). */
  val assocRulesSql: String =
    s"""WITH ${Sessionize.sessionTagCtes}, baskets AS (
       |  SELECT DISTINCT user_id, session_seq, event_type FROM s3
       |), ns AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_sessions
       |  FROM (SELECT DISTINCT user_id, session_seq FROM baskets)
       |), tc AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS c_one
       |  FROM baskets GROUP BY 1
       |), pc AS (
       |  SELECT b1.event_type AS a, b2.event_type AS b,
       |         CAST(count(*) AS BIGINT) AS c_ab
       |  FROM baskets b1 JOIN baskets b2
       |    ON b1.user_id = b2.user_id AND b1.session_seq = b2.session_seq
       |   AND b1.event_type < b2.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT a, b, c_ab, ta.c_one AS c_a, tb.c_one AS c_b, n_sessions,
       |       c_ab * 1000000 // n_sessions AS support_ppm,
       |       c_ab * 1000000 // ta.c_one AS conf_a_to_b_ppm,
       |       c_ab * 1000000 // tb.c_one AS conf_b_to_a_ppm,
       |       ${rsql("(CAST(c_ab * n_sessions AS DOUBLE) / (ta.c_one * tb.c_one))", 4, "lift")}
       |FROM pc JOIN tc ta ON pc.a = ta.event_type
       |        JOIN tc tb ON pc.b = tb.event_type
       |        CROSS JOIN ns
       |ORDER BY a, b""".stripMargin
}
