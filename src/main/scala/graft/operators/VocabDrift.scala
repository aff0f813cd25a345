package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-snapshot VOCABULARY DRIFT (round 8, continuation) — the
  * distribution-shift report a versioned 100 TB pipeline runs alongside
  * [[CorpusDiff]]: the membership diff says WHICH docs changed; this says
  * how the corpus's unigram DISTRIBUTION moved — new terms, dropped terms,
  * and the top frequency movers — the signal that catches "the new crawl
  * slice is 40% SEO spam" before a tokenizer or mixture is refit on it.
  *
  * Cross-engine exactness (§6): per-version frequencies are integer ppm —
  * `c · 10⁶ div N` (both engines divide nonnegative BIGINTs, so floor ==
  * trunc); delta_ppm is a BIGINT difference; the mover rank key
  * (abs(delta_ppm) DESC, term ASC) is total because `term` is unique in
  * the joined vocabulary. No float anywhere. BIGINT headroom: `c · 10⁶`
  * overflows only past ~9·10¹² tokens per version — beyond that the ppm
  * constant becomes a per-billion constant, shape unchanged.
  *
  * Scale shape: per version, one inline-exploded token stream (the
  * Generate child is the filter(split(...)) EXPRESSION — the named-column
  * form is the measured 11× pushdown trap) into a map-side-combinable
  * count. The term-keyed FULL OUTER join is vocabulary-sized (corpus-
  * sublinear), the two 1-row totals ride the documented broadcast-fact
  * nested loops, and the top-K is orderBy().limit(K) — planned as
  * TakeOrderedAndProject (per-partition partial top-K + K-row merge),
  * never a global sort (spec-pinned). Version snapshots are derived from
  * the one documents frame by cheap map passes — the corpusDiff two-scan
  * precedent (recompute = a scan, no checkpoint needed).
  *
  * Reference analog: the bronze→silver loop re-derives "what's new" per
  * run (bronze-to-silver.py:31-58); this is that versioning idea lifted
  * from row membership to distribution shape.
  */
object VocabDrift {

  /** Report width: top movers by |delta_ppm|. */
  val TopK = 100

  private val tokExpr =
    "filter(split(lower(trim(coalesce(text, ''))), '\\\\s+'), t -> t <> '')"

  private def termCounts(snap: DataFrame, cName: String): DataFrame =
    snap.select(explode(expr(tokExpr)).as("term"))
      .groupBy("term").agg(count(lit(1)).as(cName))

  /** Drift between two snapshot frames (doc_id, text, …). */
  def vocabDrift(oldSnap: DataFrame, newSnap: DataFrame,
                 k: Int = TopK): DataFrame = {
    val oc = termCounts(oldSnap, "old_c")
    val nc = termCounts(newSnap, "new_c")
    val tot = oc.agg(coalesce(sum("old_c"), lit(0L)).as("n_old"))
      .crossJoin(nc.agg(coalesce(sum("new_c"), lit(0L)).as("n_new")))
    oc.join(nc, Seq("term"), "full_outer")
      .crossJoin(broadcast(tot))
      .withColumn("status",
        when(col("old_c").isNull, lit("added"))
          .when(col("new_c").isNull, lit("dropped"))
          .otherwise(lit("shared")))
      .withColumn("old_ppm",
        expr("coalesce(old_c, 0) * 1000000 div greatest(n_old, 1)"))
      .withColumn("new_ppm",
        expr("coalesce(new_c, 0) * 1000000 div greatest(n_new, 1)"))
      .withColumn("delta_ppm", expr("new_ppm - old_ppm"))
      .select(col("term"), col("status"),
        coalesce(col("old_c"), lit(0L)).as("old_c"),
        coalesce(col("new_c"), lit(0L)).as("new_c"),
        col("old_ppm"), col("new_ppm"), col("delta_ppm"))
      .orderBy(abs(col("delta_ppm")).desc, col("term"))
      .limit(k)
  }

  /** Registered form over the [[CorpusDiff]] synthetic version history. */
  def vocabDriftQ(documents: DataFrame): DataFrame =
    vocabDrift(CorpusDiff.oldSnapshot(documents),
               CorpusDiff.newSnapshot(documents))
      .orderBy(abs(col("delta_ppm")).desc, col("term"))

  val vocabDriftSql: String =
    s"""WITH vk AS (
       |  SELECT doc_id, text,
       |         substring(md5('graft-ver:' || CAST(doc_id AS VARCHAR)), 1, 1) AS ver_key
       |  FROM documents
       |), ot AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+'), t -> t <> '')) AS term
       |  FROM vk WHERE ver_key NOT IN ('0', '1')
       |), nt AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(trim(COALESCE(
       |           CASE WHEN ver_key IN ('2', '3') THEN text || ' [rev2]' ELSE text END,
       |           ''))), '\\s+'), t -> t <> '')) AS term
       |  FROM vk WHERE ver_key NOT IN ('e', 'f')
       |), oc AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS old_c FROM ot GROUP BY term
       |), nc AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS new_c FROM nt GROUP BY term
       |), tot AS (
       |  SELECT (SELECT CAST(COALESCE(sum(old_c), 0) AS BIGINT) FROM oc) AS n_old,
       |         (SELECT CAST(COALESCE(sum(new_c), 0) AS BIGINT) FROM nc) AS n_new
       |), j AS (
       |  SELECT COALESCE(oc.term, nc.term) AS term, old_c, new_c
       |  FROM oc FULL JOIN nc ON oc.term = nc.term
       |), p AS (
       |  SELECT term,
       |         CASE WHEN old_c IS NULL THEN 'added'
       |              WHEN new_c IS NULL THEN 'dropped'
       |              ELSE 'shared' END AS status,
       |         COALESCE(old_c, 0) AS old_c, COALESCE(new_c, 0) AS new_c,
       |         COALESCE(old_c, 0) * 1000000 // greatest(n_old, 1) AS old_ppm,
       |         COALESCE(new_c, 0) * 1000000 // greatest(n_new, 1) AS new_ppm
       |  FROM j CROSS JOIN tot
       |)
       |SELECT term, status, old_c, new_c, old_ppm, new_ppm,
       |       new_ppm - old_ppm AS delta_ppm
       |FROM p
       |ORDER BY abs(new_ppm - old_ppm) DESC, term
       |LIMIT $TopK""".stripMargin
}
