package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-key SKEW REPORT (round 8, continuation) — the diagnostic that
  * FEEDS the skew machinery the suite already ships: [[Skew.saltedJoinHot]]
  * and [[Dedup]]'s hot-shingle salting both take a hot-key list as input;
  * this operator is where that list comes from. Top-K heaviest keys with
  * row share and a multiple-of-mean ratio, plus the hot verdict at a
  * configurable threshold — run it on a join key BEFORE the join, wire
  * the flagged keys into the salting dial.
  *
  * Cross-engine exactness (§6): share is integer ppm (`n · 10⁶ div
  * total`); the mean multiple is `n · 1000 div max(total div distinct,
  * 1)` — the mean itself is an integer floor-average, so every quantity
  * stays a bounded BIGINT at any scale (no n·distinct cross products).
  * Rank key (n DESC, key ASC) is total; hot = mean multiple ≥ threshold
  * per-mille. All integers.
  *
  * Scale shape: one map-side-combinable per-key count, a 1-row global
  * aggregate riding the documented broadcast-fact nested loop, and a
  * TakeOrderedAndProject top-K (partial per-partition top-K + K-row
  * merge — never a global sort, spec-pinned). The report is K rows.
  */
object KeySkew {

  val TopK = 20
  /** Hot when a key carries ≥ this many per-mille of the MEAN key's rows
    * (2000 = 2× mean). */
  val HotMilli = 2000L

  def keySkewReport(df: DataFrame, key: Column,
                    k: Int = TopK, hotMilli: Long = HotMilli): DataFrame = {
    val counts = df.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      coalesce(sum("n"), lit(0L)).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n * 1000000 div greatest(total, 1)"))
      .withColumn("mean_x_milli",
        expr("n * 1000 div greatest(total div greatest(n_keys, 1), 1)"))
      .withColumn("is_hot", expr(s"mean_x_milli >= $hotMilli"))
      .select(col("key"), col("n"), col("share_ppm"),
        col("mean_x_milli"), col("is_hot"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }

  def keySkewReportQ(lineitem: DataFrame): DataFrame =
    keySkewReport(lineitem, col("l_partkey"))
      .orderBy(col("n").desc, col("key"))

  /** c/t count CTE generator shared with [[SaltingPlan]]'s oracle (one
    * text per key column — report and plan can't disagree on counting). */
  private[operators] def keyCountCtes(keyCol: String): String =
    s"""c AS (
       |  SELECT $keyCol AS key, CAST(count(*) AS BIGINT) AS n
       |  FROM lineitem GROUP BY 1
       |), t AS (
       |  SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS total,
       |         CAST(count(*) AS BIGINT) AS n_keys
       |  FROM c
       |)""".stripMargin

  val keySkewReportSql: String =
    s"""WITH ${keyCountCtes("l_partkey")}
       |SELECT key, n,
       |       n * 1000000 // greatest(total, 1) AS share_ppm,
       |       n * 1000 // greatest(total // greatest(n_keys, 1), 1) AS mean_x_milli,
       |       n * 1000 // greatest(total // greatest(n_keys, 1), 1) >= $HotMilli AS is_hot
       |FROM c CROSS JOIN t
       |ORDER BY n DESC, key
       |LIMIT $TopK""".stripMargin
}
