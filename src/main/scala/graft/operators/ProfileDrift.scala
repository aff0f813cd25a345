package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot PROFILE DRIFT (round 8, continuation) — the
  * monitoring twin of [[CorpusDiff]]: instead of per-document verdicts,
  * the per-SOURCE statistical profile of both corpus versions side by
  * side with deltas — doc counts, character mass, language inventory.
  * This is the dashboard row a data-version bump is judged by before
  * anyone reads a diff: "src3 lost 8% of its docs and a language" is
  * visible here at any corpus size, where the doc-level diff is already
  * too big to eyeball. [[VocabDrift]] tracks the token distribution;
  * this tracks the shape of the TABLE itself.
  *
  * Shares [[CorpusDiff.oldSnapshot]]/[[CorpusDiff.newSnapshot]]'s
  * deterministic synthetic version history (and the oracle re-derives
  * the same hex-fate convention) so the three version-diff operators
  * describe the same transition.
  *
  * Cross-engine exactness (§6): all outputs are exact integer counts /
  * sums / deltas; char mass uses `length(text)` on the snapshot's text
  * (the revision marker must count — it IS new content).
  *
  * Scale shape: two map-side-combinable per-source aggregations (each
  * collapses its snapshot scan to |sources| rows) and one
  * catalog-sized full-outer join — drift must also report a source
  * that appeared or vanished entirely.
  */
object ProfileDrift {

  private def profile(snap: DataFrame, prefix: String): DataFrame =
    snap.groupBy("source").agg(
      count(lit(1)).as(s"${prefix}_docs"),
      coalesce(sum(length(coalesce(col("text"), lit("")))), lit(0L))
        .cast("long").as(s"${prefix}_chars"),
      countDistinct("lang").as(s"${prefix}_langs"))

  def profileDrift(documents: DataFrame): DataFrame = {
    val o = profile(CorpusDiff.oldSnapshot(documents), "old")
    val n = profile(CorpusDiff.newSnapshot(documents), "new")
    o.join(n, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("old_docs"), lit(0L)).as("old_docs"),
        coalesce(col("new_docs"), lit(0L)).as("new_docs"),
        (coalesce(col("new_docs"), lit(0L)) - coalesce(col("old_docs"), lit(0L)))
          .as("delta_docs"),
        coalesce(col("old_chars"), lit(0L)).as("old_chars"),
        coalesce(col("new_chars"), lit(0L)).as("new_chars"),
        (coalesce(col("new_chars"), lit(0L)) - coalesce(col("old_chars"), lit(0L)))
          .as("delta_chars"),
        coalesce(col("old_langs"), lit(0L)).as("old_langs"),
        coalesce(col("new_langs"), lit(0L)).as("new_langs"))
  }

  def profileDriftQ(documents: DataFrame): DataFrame =
    profileDrift(documents).orderBy("source")

  val profileDriftSql: String =
    s"""WITH vk AS (
       |  SELECT doc_id, text, lang, source,
       |         substring(md5('graft-ver:' || CAST(doc_id AS VARCHAR)), 1, 1) AS ver_key
       |  FROM documents
       |), oldp AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS old_docs,
       |         CAST(COALESCE(sum(length(COALESCE(text, ''))), 0) AS BIGINT) AS old_chars,
       |         CAST(count(DISTINCT lang) AS BIGINT) AS old_langs
       |  FROM vk WHERE ver_key NOT IN ('0', '1')
       |  GROUP BY 1
       |), newp AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS new_docs,
       |         CAST(COALESCE(sum(length(COALESCE(
       |           CASE WHEN ver_key IN ('2', '3') THEN text || ' [rev2]' ELSE text END,
       |           ''))), 0) AS BIGINT) AS new_chars,
       |         CAST(count(DISTINCT lang) AS BIGINT) AS new_langs
       |  FROM vk WHERE ver_key NOT IN ('e', 'f')
       |  GROUP BY 1
       |)
       |SELECT COALESCE(o.source, n.source) AS source,
       |       COALESCE(o.old_docs, 0) AS old_docs,
       |       COALESCE(n.new_docs, 0) AS new_docs,
       |       COALESCE(n.new_docs, 0) - COALESCE(o.old_docs, 0) AS delta_docs,
       |       COALESCE(o.old_chars, 0) AS old_chars,
       |       COALESCE(n.new_chars, 0) AS new_chars,
       |       COALESCE(n.new_chars, 0) - COALESCE(o.old_chars, 0) AS delta_chars,
       |       COALESCE(o.old_langs, 0) AS old_langs,
       |       COALESCE(n.new_langs, 0) AS new_langs
       |FROM oldp o FULL JOIN newp n ON o.source = n.source
       |ORDER BY source""".stripMargin
}
