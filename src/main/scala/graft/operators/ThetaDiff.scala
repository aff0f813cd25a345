package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THETA-SKETCH DISTINCT-DIFF (round 9) — the sketch-discipline
  * extension the cardinality family stops at: [[CardinalityReport]]
  * ships exact + measured-HLL DISTINCT COUNTS, but HLL registers cannot
  * answer SET ALGEBRA — "how many documents were ADDED between
  * snapshots" needs |new ∖ old|, and differencing two HLL estimates is
  * unsound (the errors don't subtract). The theta-sketch family (public
  * DataSketches design) fixes this: keep a uniform HASH SAMPLE of each
  * distinct set below a fixed threshold θ; union / intersection /
  * difference are then computed EXACTLY on the samples and scaled by
  * 1/p — set algebra over mergeable integer state.
  *
  * The sketched universe is the corpus's distinct CONTENT FINGERPRINTS
  * (the [[CorpusDiff]]/[[Cdc]] md5 normalization — the unit
  * [[ProfileDrift]] counts and [[CorpusDiff]] diffs exactly), and θ is
  * pinned to the fingerprint's own first hex digit: sampled iff
  * `substring(fp, 1, 1) < '$ThetaHexBound'` — p = bound/16 exactly,
  * engine-neutral, so unlike the HLL path this IS sql-oracled (both
  * engines compute the identical sketch). Estimates are integers:
  * `sample_count · 16/bound`.
  *
  * Scale shape (the one-pass claim): the sampling predicate is map-side
  * and kills (1 − p) of the stream BEFORE the distinct's exchange — the
  * exact diff shuffles every fingerprint, the sketch shuffles p of
  * them — and the sampled fp sets are MERGEABLE across shards and
  * snapshots by plain union (sample(A ∪ B) = sample(A) ∪ sample(B) for
  * fixed θ — spec-pinned, the property that lets 1000 executors sketch
  * independently and a coordinator diff the merged registers). Error:
  * binomial over the distinct universe, sd(est) = √(n·(1−p)/p);
  * ThetaDiffSpec pins every estimate inside 3σ of the exact per-source
  * diff at gate scale — the CardinalitySpec measured-error pattern.
  * Tuning: p shrinks as the corpus grows (at 10⁹ docs, p = 16⁻⁶ still
  * leaves ~4k-row samples per stratum with sub-2% rsd).
  */
object ThetaDiff {

  /** Sampling bound: fp's first hex digit ∈ ['0', ThetaHexBound) ⇒
    * p = bound/16. 4 ⇒ p = 1/4 — gate-scale strata are tens of docs, so
    * the sample has to stay dense to say anything; a 100 TB deployment
    * narrows p instead. */
  val ThetaHexBound = 4
  val Scale: Long = 16L / ThetaHexBound

  private val FpExpr =
    "md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"

  /** The sketch: per-source SAMPLED distinct fingerprint set. Filter
    * BEFORE distinct — the predicate depends only on the fp, so every
    * duplicate passes or fails together and the exchange carries p of
    * the universe. */
  private[graft] def thetaFps(snap: DataFrame): DataFrame =
    snap.select(col("source"), expr(FpExpr).as("fp"))
      .filter(expr(s"substring(fp, 1, 1) < '$ThetaHexBound'"))
      .distinct()

  /** Per-source distinct-content diff between two snapshot frames,
    * every estimate an integer multiple of 16/bound. */
  def thetaDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    thetaFps(oldSnap).withColumn("in_old", lit(1L))
      .join(thetaFps(newSnap).withColumn("in_new", lit(1L)),
        Seq("source", "fp"), "full_outer")
      .groupBy("source")
      .agg(
        sum(coalesce(col("in_old"), lit(0L))).as("s_old"),
        sum(coalesce(col("in_new"), lit(0L))).as("s_new"),
        sum(when(col("in_new").isNull, 1L).otherwise(0L)).as("s_removed"),
        sum(when(col("in_old").isNull, 1L).otherwise(0L)).as("s_added"),
        sum(when(col("in_old").isNotNull && col("in_new").isNotNull, 1L)
          .otherwise(0L)).as("s_common"))
      .select(col("source"),
        expr(s"s_old * $Scale").as("est_old_docs"),
        expr(s"s_new * $Scale").as("est_new_docs"),
        expr(s"s_added * $Scale").as("est_added"),
        expr(s"s_removed * $Scale").as("est_removed"),
        expr(s"s_common * $Scale").as("est_common"))

  /** Registered over the [[CorpusDiff]] synthetic version history — the
    * same transition [[CorpusDiff]]/[[ProfileDrift]] describe exactly,
    * reported approximately in one sampled pass. */
  def thetaDiffQ(documents: DataFrame): DataFrame =
    thetaDiff(CorpusDiff.oldSnapshot(documents),
              CorpusDiff.newSnapshot(documents))
      .orderBy("source")

  /** Oracle: the identical fp-prefix sketch in DuckDB — same sample,
    * same algebra, same integers. Snapshot CTEs re-derive the
    * [[CorpusDiff]] hex-fate convention. */
  val thetaDiffSql: String = {
    val fpSql =
      "md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))"
    def sampled(src: String, name: String): String =
      s"""$name AS (
         |  SELECT DISTINCT source, fp FROM (
         |    SELECT source, $fpSql AS fp FROM $src
         |  ) WHERE substring(fp, 1, 1) < '$ThetaHexBound'
         |)""".stripMargin
    s"""WITH vk AS (
       |  SELECT doc_id, text, source,
       |         substring(md5('graft-ver:' || CAST(doc_id AS VARCHAR)), 1, 1) AS ver_key
       |  FROM documents
       |), olds AS (
       |  SELECT text, source FROM vk WHERE ver_key NOT IN ('0', '1')
       |), news AS (
       |  SELECT CASE WHEN ver_key IN ('2', '3') THEN text || ' [rev2]'
       |              ELSE text END AS text,
       |         source
       |  FROM vk WHERE ver_key NOT IN ('e', 'f')
       |), ${sampled("olds", "so")}, ${sampled("news", "sn")}
       |SELECT COALESCE(so.source, sn.source) AS source,
       |       CAST(count(so.fp) * $Scale AS BIGINT) AS est_old_docs,
       |       CAST(count(sn.fp) * $Scale AS BIGINT) AS est_new_docs,
       |       CAST(sum(CASE WHEN so.fp IS NULL AND sn.fp IS NOT NULL THEN 1 ELSE 0 END) * $Scale AS BIGINT) AS est_added,
       |       CAST(sum(CASE WHEN so.fp IS NOT NULL AND sn.fp IS NULL THEN 1 ELSE 0 END) * $Scale AS BIGINT) AS est_removed,
       |       CAST(sum(CASE WHEN so.fp IS NOT NULL AND sn.fp IS NOT NULL THEN 1 ELSE 0 END) * $Scale AS BIGINT) AS est_common
       |FROM so FULL JOIN sn ON so.source = sn.source AND so.fp = sn.fp
       |GROUP BY 1
       |ORDER BY source""".stripMargin
  }
}
