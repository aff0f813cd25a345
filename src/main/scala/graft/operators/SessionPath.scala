package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SESSION PATH MINING — the top-K most common within-session
  * event-type sequences (the "user journey" report every funnel
  * analysis starts from; [[Funnel]] checks ONE fixed sequence, this
  * surfaces which sequences exist and how often). Sessions are
  * [[Sessionize.sessionTagged]]'s gap rule — one shared definition,
  * Spark and SQL.
  *
  * Determinism: the path string is the session's event types joined in
  * (t_us, event_id) order — Spark materializes the order by sorting an
  * array of (t_us, event_id, event_type) structs (lexicographic struct
  * compare = the window order; event_id is unique so the sort is
  * total), DuckDB via `string_agg(... ORDER BY t_us, event_id)`. Top-K
  * is (count DESC, path ASC) — total because paths are grouped.
  *
  * Scale shape: the session window's user_id exchange, one
  * (user, session) aggregation (collect_list is bounded by session
  * length — sessions are gap-bounded, not corpus-bounded), one path
  * aggregation, then TakeOrderedAndProject for the top-K — NO global
  * sort (spec-pinned; the vocab_build precedent).
  */
object SessionPath {

  val TopK = 20

  def sessionPaths(events: DataFrame, topK: Int = TopK): DataFrame = {
    val paths = Sessionize.sessionTagged(events)
      .groupBy("user_id", "session_seq")
      .agg(sort_array(collect_list(struct(col("t_us"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(expr("array_join(transform(evs, e -> e.event_type), '>')").as("path"),
        expr("size(evs)").as("len"))
    paths.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        first(col("len")).as("lenAny")) // same path ⇒ same length
      .select(col("path"), expr("CAST(lenAny AS BIGINT)").as("path_len"),
        col("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  def sessionPathsQ(events: DataFrame): DataFrame = sessionPaths(events)

  val sessionPathSql: String =
    s"""WITH ${Sessionize.sessionTagCtes}, paths AS (
       |  SELECT user_id, session_seq,
       |         string_agg(event_type, '>' ORDER BY t_us, event_id) AS path,
       |         count(*) AS len
       |  FROM s3 GROUP BY user_id, session_seq
       |)
       |SELECT path, CAST(any_value(len) AS BIGINT) AS path_len,
       |       count(*) AS n_sessions
       |FROM paths GROUP BY path
       |ORDER BY n_sessions DESC, path
       |LIMIT $TopK""".stripMargin
}
