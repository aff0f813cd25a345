package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VACUUM PLAN (round 8, continuation 5) — the lake-maintenance
  * primitive closing the Delta-semantics family ([[Cdc]] MERGE +
  * VERSION AS OF, #122 SCD2, #123 ZORDER, the compaction InfraSpec
  * row): over the append-only change log, which entries the retention
  * policy can physically remove. An entry is RETAINED iff it is its
  * key's latest (the live snapshot needs it — including delete
  * tombstones, which must survive until the horizon so replays stay
  * correct) or within the last [[RetainVersions]] table versions (the
  * time-travel window VERSION AS OF queries still hit); everything
  * older is vacuumable. Per version: entry counts, retained /
  * vacuumable split, tombstones retained — the "how much does a
  * VACUUM buy" report run BEFORE one.
  *
  * Cross-engine exactness (SURVEY §6): exact BIGINT counts; latest =
  * row_number over (version DESC) per key (total — one entry per
  * (key, version) by the log's construction); the horizon is an
  * integer compare against the 1-row max-version fact.
  *
  * Scale shape: one key-keyed window exchange over the log (the
  * [[Cdc.snapshotAt]] exchange), a 1-row horizon fact (broadcast-fact
  * class), a |versions|-sized rollup.
  */
object VacuumPlan {

  /** Time-travel window: the latest N table versions stay queryable. */
  val RetainVersions = 1L

  def vacuumPlan(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("version").desc)
    val mx = log.agg(max("version").as("v_max"))
    log.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(mx))
      .withColumn("retained",
        col("rn") === 1 || col("version") > col("v_max") - RetainVersions)
      .groupBy("version")
      .agg(count(lit(1)).as("n_entries"),
        sum(when(col("retained"), 1L).otherwise(0L)).as("n_retained"),
        sum(when(!col("retained"), 1L).otherwise(0L)).as("n_vacuumable"),
        sum(when(col("retained") && col("op") === "delete", 1L).otherwise(0L))
          .as("n_tombstones_retained"))
  }

  def vacuumPlanQ(documents: DataFrame): DataFrame =
    vacuumPlan(Cdc.changeLog(documents)).orderBy("version")

  /** Rides [[Cdc.changeLogCtes]] verbatim (one log text). */
  val vacuumPlanSql: String =
    s"""WITH ${Cdc.changeLogCtes}, mx AS (
       |  SELECT max(version) AS v_max FROM log
       |), rn AS (
       |  SELECT version, op,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
       |  FROM log
       |), flagged AS (
       |  SELECT version, op,
       |         (rn = 1 OR version > v_max - $RetainVersions) AS retained
       |  FROM rn CROSS JOIN mx
       |)
       |SELECT version,
       |       CAST(count(*) AS BIGINT) AS n_entries,
       |       CAST(sum(CASE WHEN retained THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       |       CAST(sum(CASE WHEN NOT retained THEN 1 ELSE 0 END) AS BIGINT) AS n_vacuumable,
       |       CAST(sum(CASE WHEN retained AND op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones_retained
       |FROM flagged
       |GROUP BY 1
       |ORDER BY version""".stripMargin
}
