package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AUDIENCE OVERLAP (round 8, continuation 5) — the user-set overlap
  * matrix between event types: for every unordered type pair, common
  * users and user-set Jaccard ppm. [[AssocRules]] asks "do these types
  * co-occur in one SESSION"; this asks "are these two features used by
  * the same PEOPLE at all" — the product-surface overlap a roadmap
  * (or an event-type consolidation) is argued from.
  *
  * Cross-engine exactness (SURVEY §6): exact distinct-user counts,
  * Jaccard as integer ppm `common·10⁶ div (n1 + n2 − common)` (union
  * ≥ 1 whenever the pair row exists, and the sorted-pair canonical
  * order (t1 < t2) is a total string order both engines share).
  *
  * Scale shape: the stream collapses to DISTINCT (user, type) FIRST
  * (dedup-early — |events| → ≤ |users|·|types|), pairs generate
  * per-user from the sorted type array (bounded by the type CATALOG:
  * ≤ C(|types|,2) per user, the [[AssocRules]] basket argument — never
  * a user×user product), and per-type sizes join the catalog²-bounded
  * pair counts. One user exchange + catalog-sized everything after.
  */
object AudienceOverlap {

  def audienceOverlap(events: DataFrame): DataFrame = {
    val ut = events.select("user_id", "event_type").distinct()
    val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = ut.groupBy("user_id")
      .agg(sort_array(collect_set("event_type")).as("types"))
      .select(explode(expr(
        """flatten(transform(types, (t, i) ->
          |  transform(slice(types, i + 2, greatest(size(types) - i - 1, 0)),
          |    u -> struct(t AS t1, u AS t2))))""".stripMargin)).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("t1"), col("n").as("n1"))), Seq("t1"))
      .join(broadcast(sizes.select(col("event_type").as("t2"), col("n").as("n2"))), Seq("t2"))
      .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n_common"),
        expr("n_common * 1000000 div (n1 + n2 - n_common)").as("jaccard_ppm"))
  }

  def audienceOverlapQ(events: DataFrame): DataFrame =
    audienceOverlap(events).orderBy("t1", "t2")

  /** DuckDB twin derives pairs by an independent route — a distinct-set
    * SELF-JOIN on user — so agreement also proves the array pair
    * enumeration ([[AssocRules]]' oracle argument). */
  val audienceOverlapSql: String =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events
      |), sizes AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
      |), pairs AS (
      |  SELECT a.event_type AS t1, b.event_type AS t2,
      |         CAST(count(*) AS BIGINT) AS n_common
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT t1, t2, s1.n AS n1, s2.n AS n2, n_common,
      |       n_common * 1000000 // (s1.n + s2.n - n_common) AS jaccard_ppm
      |FROM pairs
      |JOIN sizes s1 ON s1.event_type = t1
      |JOIN sizes s2 ON s2.event_type = t2
      |ORDER BY t1, t2""".stripMargin
}
