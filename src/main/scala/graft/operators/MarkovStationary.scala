package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STATIONARY DISTRIBUTION of the session Markov chain (round 13) —
  * the long-run complement to [[EventTransitions]]' one-step matrix:
  * where does a user's attention SETTLE if the observed dynamics run
  * forever (the PageRank question asked of the behavioral chain —
  * power iteration, public). [[SessionPath]] reads observed paths,
  * [[EventTransitions]] the one-step probabilities; the stationary π
  * ranks states by steady-state occupancy — the number a capacity
  * planner or attention report actually wants.
  *
  * Contract (stated, like change_point_k's fixed-K): π is the K-step
  * power iterate from the uniform start, K = [[Iterations]] unrolled —
  * a deterministic report, not a fixed-point solver; on the gate's
  * aperiodic dense chain K=8 is far past visible movement in ppm, and
  * since round 14 the output SHOWS that: `l1_delta_ppm` is the L1
  * distance Σ|π_K − π_{K−1}| in ppm, constant across rows — a report
  * reader sees the iterate has settled without trusting the K choice.
  * The chain is restricted ONE PASS to states that EMIT at least one
  * transition (terminal-only states have no defined outflow); edges
  * into dropped states are removed and surviving rows renormalize over
  * their surviving edges. Precision corner (r13 advice, both engines
  * identical so the gate is unaffected): a kept state whose ONLY
  * successors were terminal loses all its out-edges in that one pass —
  * mass flowing into it is renormalized away each round rather than
  * re-emitted (iterating the restriction to a fixed point would drop
  * such states entirely; the one-pass form keeps the report spine
  * stable and states the semantics instead).
  *
  * §6 (the [[EmbeddingPrincipal]] integer-iteration discipline): P is
  * integer ppm (`n·10⁶ div row_total` after the restriction); each
  * round computes raw mass `w_j = Σ_i π_i · p_ij` in BIGINT (π ≤ 10⁶,
  * p ≤ 10⁶, |states| catalog-sized ⇒ ≤ 10¹²·|states| per cell) and
  * renormalizes `π'_j = w_j·10⁶ div Σw` — identical truncation both
  * engines, Σπ stays 10⁶ ± |states| truncation units.
  *
  * Scale: ONE user-keyed exchange (the lag window — the only
  * data-volume stage, shared shape with #116); the matrix is
  * ≤ catalog² rows, checkpointed ONCE (K consumers), and each round's
  * π frame is |states| rows, checkpointed per round (the 2^K
  * iterated-lineage rule); the per-round total rides an unpartitioned
  * window over the catalog frame (the allowed class). */
object MarkovStationary {

  val Iterations = 8

  /** Restricted row-stochastic matrix (prev_type, curr_type, p_ppm). */
  private def matrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("curr_type"))
    val counts = pairs.groupBy("prev_type", "curr_type").agg(count(lit(1)).as("n"))
      .localCheckpoint() // 2 consumers: the emitter spine + the restriction
    val emitters = counts.select(col("prev_type").as("curr_type")).distinct()
    counts.join(emitters, Seq("curr_type"), "left_semi")
      .withColumn("row_total", sum("n").over(Window.partitionBy("prev_type")))
      .select(col("prev_type"), col("curr_type"),
        expr("n * 1000000 div row_total").as("p_ppm"))
  }

  def transitionStationary(events: DataFrame, k: Int = Iterations): DataFrame = {
    val pm = matrix(events).localCheckpoint() // K consumers
    val whole = Window.partitionBy()
    var pi = pm.select(col("prev_type").as("state")).distinct()
      .withColumn("n_states", count(lit(1)).over(whole))
      .select(col("state"), expr("1000000L div n_states").as("pi"))
      .localCheckpoint()
    var prev = pi // π_{K-1}, for the convergence diagnostic
    for (_ <- 1 to k) {
      prev = pi
      pi = pi.join(pm, col("state") === col("prev_type"))
        .groupBy(col("curr_type").as("state"))
        .agg(sum(expr("pi * p_ppm")).as("w"))
        .withColumn("tot", sum("w").over(whole))
        .select(col("state"), expr("w * 1000000 div tot").as("pi"))
        .localCheckpoint() // per-round: the 2^K iterated-lineage rule
    }
    // convergence diagnostic (round 14): L1 ppm distance between the last
    // two iterates, full-outer so a state present in only one of them
    // contributes its whole mass; both frames are |states|-row checkpoints,
    // the unpartitioned window sum is the allowed catalog class
    pi.join(prev.select(col("state"), col("pi").as("pp")), Seq("state"), "full_outer")
      .select(col("state"),
        coalesce(col("pi"), lit(0L)).as("pi_ppm"),
        abs(coalesce(col("pi"), lit(0L)) - coalesce(col("pp"), lit(0L))).as("d"))
      .select(col("state"), col("pi_ppm"), sum("d").over(whole).as("l1_delta_ppm"))
  }

  def transitionStationaryQ(events: DataFrame): DataFrame =
    transitionStationary(events).orderBy("state")

  /** Generated K-round CTE chain (the change_point_k technique): the
    * restricted ppm matrix, uniform π₀, then per round a mass join +
    * window-sum renormalization — same integer text as Spark. The final
    * select full-outer-joins π_K with π_{K−1} for the L1 diagnostic,
    * referencing each round CTE exactly ONCE via window sums (a
    * scalar-subquery form re-evaluates the CTE chain exponentially in
    * DuckDB — measured in round 13, avoided). */
  val transitionStationarySql: String = {
    val rounds = (1 to Iterations).map { r =>
      s"""w$r AS (
         |  SELECT m.curr_type AS state, CAST(sum(p.pi * m.p_ppm) AS BIGINT) AS w
         |  FROM pi${r - 1} p JOIN pm m ON m.prev_type = p.state
         |  GROUP BY 1
         |), pi$r AS (
         |  SELECT state, w * 1000000 // CAST(sum(w) OVER () AS BIGINT) AS pi
         |  FROM w$r
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT user_id, event_id,
       |         epoch_us(date_trunc('microseconds', ts)) AS us,
       |         event_type
       |  FROM events
       |), pr AS (
       |  SELECT lag(event_type) OVER (PARTITION BY user_id
       |                               ORDER BY us, event_id) AS prev_type,
       |         event_type AS curr_type
       |  FROM e
       |), c AS (
       |  SELECT prev_type, curr_type, CAST(count(*) AS BIGINT) AS n
       |  FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2
       |), ck AS (
       |  SELECT * FROM c
       |  WHERE curr_type IN (SELECT DISTINCT prev_type FROM c)
       |), pm AS (
       |  SELECT prev_type, curr_type,
       |         n * 1000000 // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppm
       |  FROM ck
       |), pi0 AS (
       |  SELECT state,
       |         CAST(1000000 AS BIGINT) // CAST(count(*) OVER () AS BIGINT) AS pi
       |  FROM (SELECT DISTINCT prev_type AS state FROM pm)
       |), $rounds, d AS (
       |  SELECT COALESCE(a.state, b.state) AS state,
       |         COALESCE(a.pi, 0) AS pi_ppm,
       |         abs(COALESCE(a.pi, 0) - COALESCE(b.pi, 0)) AS dd
       |  FROM pi$Iterations a FULL OUTER JOIN pi${Iterations - 1} b
       |    ON b.state = a.state
       |)
       |SELECT state, CAST(pi_ppm AS BIGINT) AS pi_ppm,
       |       CAST(sum(dd) OVER () AS BIGINT) AS l1_delta_ppm
       |FROM d
       |ORDER BY state""".stripMargin
  }
}
