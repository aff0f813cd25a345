package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SALTING PLAN (round 8, continuation 5) — the output side of the
  * skew tooling: [[KeySkew]] says WHICH join keys are hot; this says
  * HOW MUCH salt each one needs. For every hot key (the shared
  * [[KeySkew.HotMilli]] verdict — one rule, spec-pinned), the salt
  * factor that brings its per-task share back to an average reducer's
  * load: `salt = ⌈n·parts / total⌉`, capped at `parts` (splitting
  * finer than the cluster's parallelism buys nothing). The emitted
  * (key, salt) list is literally the input contract of
  * [[Skew.saltedJoinHot]] — report in, dial out.
  *
  * Cross-engine exactness (SURVEY §6): ceiling division as
  * `(n·parts + total − 1) div total` over non-negative BIGINTs; the
  * `parts` dial is an explicit constant in the registered query
  * ([[Relational]] conf-independence rule: an oracle can't read the
  * session's shuffle width, so the QUERY form pins 32 and the
  * operator takes it as a parameter).
  *
  * Scale shape: identical to [[KeySkew]] — one combinable per-key
  * count, a 1-row total fact, TakeOrderedAndProject (K rows out).
  */
object SaltingPlan {

  /** Registered-query parts dial (the local-mode shuffle width). */
  val PlanParts = 32L

  def saltingPlan(df: DataFrame, key: Column, parts: Long = PlanParts,
                  k: Int = KeySkew.TopK,
                  hotMilli: Long = KeySkew.HotMilli): DataFrame = {
    val counts = df.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      coalesce(sum("n"), lit(0L)).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .filter(expr(s"n * 1000 div greatest(total div greatest(n_keys, 1), 1) >= $hotMilli"))
      .select(col("key"), col("n"),
        expr(s"least((n * $parts + total - 1) div greatest(total, 1), $parts)")
          .as("salt_ways"))
      .withColumn("rows_per_task", expr("n div salt_ways"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }

  /** Registered on the lineitem→orders fact-join key — the join where
    * salting actually matters, and the one with live hot keys at gate
    * (l_orderkey peaks at ~3.3× mean; l_partkey is near-uniform). */
  def saltingPlanQ(lineitem: DataFrame): DataFrame =
    saltingPlan(lineitem, col("l_orderkey"))
      .orderBy(col("n").desc, col("key"))

  /** Rides [[KeySkew.keyCountCtes]] verbatim — report and plan cannot
    * disagree about what "hot" means. */
  val saltingPlanSql: String =
    s"""WITH ${KeySkew.keyCountCtes("l_orderkey")}
       |SELECT key, n,
       |       least((n * $PlanParts + total - 1) // greatest(total, 1), $PlanParts) AS salt_ways,
       |       n // least((n * $PlanParts + total - 1) // greatest(total, 1), $PlanParts) AS rows_per_task
       |FROM c CROSS JOIN t
       |WHERE n * 1000 // greatest(total // greatest(n_keys, 1), 1) >= ${KeySkew.HotMilli}
       |ORDER BY n DESC, key
       |LIMIT ${KeySkew.TopK}""".stripMargin
}
