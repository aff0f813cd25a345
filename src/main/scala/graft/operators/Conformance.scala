package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Process-model CONFORMANCE check (round 8, continuation) — the
  * process-mining pass over per-user event streams: every observed
  * adjacent transition (with the [[EventTransitions]] `_start` entry
  * state) judged against a DECLARED allowed-transition table, reporting
  * per transition its volume, affected users and the allowed/violation
  * verdict. [[EventTransitions]] DISCOVERS the empirical process; this
  * checks it against the process the org believes it runs — the
  * violation rows are the readout ("purchases without a preceding
  * click", "errors looping"). The model is a DATA TABLE like
  * [[TopicClassify]]'s taxonomy: production swaps in its own without
  * recompiling, and it broadcasts because process models are KB-sized.
  *
  * Cross-engine exactness (§6): the (t_us, event_id) total order pins
  * the lag; counts are exact; the verdict is a left-join NULL test.
  *
  * Scale shape: one (user_id)-partitioned lag window — the single
  * data-scaled exchange — then a map-side-combinable |states|²-bounded
  * (from, to) rollup with countDistinct users riding it, and a
  * broadcast join against the model table.
  */
object Conformance {

  /** Declared process model: the transitions the org believes exist.
    * (view self-loops and browse→buy paths are in; anything entering
    * `purchase` without a `click`, and error self-loops, are OUT.) */
  val AllowedTransitions: Seq[(String, String)] = Seq(
    ("_start", "view"), ("_start", "signup"),
    ("signup", "view"),
    ("view", "view"), ("view", "click"), ("view", "error"),
    ("click", "view"), ("click", "purchase"), ("click", "error"),
    ("purchase", "view"),
    ("error", "view"))

  def allowedDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    AllowedTransitions.toDF("a_from", "a_to")
  }

  def transitionConformance(events: DataFrame,
                            model: Option[DataFrame] = None): DataFrame = {
    val allowed = model.getOrElse(allowedDf(events.sparkSession))
    val w = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"), col("event_type"))
      .withColumn("from_type",
        coalesce(lag("event_type", 1).over(w), lit("_start")))
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct("user_id").as("n_users"))
    trans
      .join(broadcast(allowed),
        col("from_type") === col("a_from") && col("to_type") === col("a_to"),
        "left")
      .withColumn("is_allowed", col("a_from").isNotNull)
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        col("n_users"), col("is_allowed"))
  }

  def transitionConformanceQ(events: DataFrame): DataFrame =
    transitionConformance(events).orderBy("from_type", "to_type")

  val transitionConformanceSql: String = {
    val values = AllowedTransitions
      .map { case (f, t) => s"('$f', '$t')" }.mkString(", ")
    s"""WITH allowed(a_from, a_to) AS (
       |  VALUES $values
       |), ev AS (
       |  SELECT user_id, event_id,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
       |         event_type
       |  FROM events
       |), tr AS (
       |  SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id
       |           ORDER BY t_us, event_id), '_start') AS from_type,
       |         event_type AS to_type, user_id
       |  FROM ev
       |), g AS (
       |  SELECT from_type, to_type,
       |         CAST(count(*) AS BIGINT) AS n_transitions,
       |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |  FROM tr GROUP BY 1, 2
       |)
       |SELECT g.from_type, g.to_type, g.n_transitions, g.n_users,
       |       a.a_from IS NOT NULL AS is_allowed
       |FROM g LEFT JOIN allowed a
       |  ON g.from_type = a.a_from AND g.to_type = a.a_to
       |ORDER BY g.from_type, g.to_type""".stripMargin
  }
}
