package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE (round 10) — the don't-recompute-the-
  * corpus answer for materialized aggregates: [[Cdc.cdcApply]] maintains
  * the TABLE under a change batch; this maintains a grouped AGGREGATE
  * view (per-source doc count + value mass) from the SAME batch without
  * rescanning the base — new_agg = old_agg + δ(batch), the classic
  * delta-rule for SUM/COUNT views (self-maintainable for inserts;
  * deletes/updates need the before-image, fetched by a batch-sized key
  * probe — never a base rescan). At 100 TB the stored view plus a
  * batch×base key join replaces a full aggregation pass per refresh;
  * reference analog: gold.py's recomputed per-group stats tables
  * (main/gold.py:40-81), here kept fresh incrementally.
  *
  * Row value = integer of the fingerprint's first [[ValDigits]] hex
  * chars (the [[CorpusShuffle]] CASE-digit construction — identical
  * text both engines, no conv()), so SUM maintenance is exercised with
  * exact integers; COUNT rides along.
  *
  * Delta rule per change row: insert (+1, +val_new); delete
  * (−1, −val_old); update (0, val_new − val_old). The before-image
  * probe and the view merge are both keyed joins of batch-sized /
  * |groups|-sized frames. The one full scan in the registered query
  * builds the BASE view — the artifact a deployment already has stored.
  *
  * The synthetic batch reuses [[Cdc]]'s md5('graft-cdc:'||id) fate
  * convention exactly (delete 0-1, update 2-4, insert e-f as id+10⁶),
  * so the ORACLE can recompute the post-batch state directly and
  * aggregate it — agreement proves the delta algebra equals a full
  * recompute. IvmSpec additionally pins batch CHAINING (two batches
  * applied incrementally == one recompute after both) and the
  * delete-to-zero edge (a group erased by the batch nets out of the
  * maintained view, not left as a zero ghost — outer-merge + filter).
  */
object Ivm {

  val ValDigits = 4

  private[graft] val FpExpr =
    "md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"
  private[graft] val KeyExpr =
    "substring(md5(concat('graft-cdc:', CAST(doc_id AS STRING))), 1, 1)"

  private val HexDigits = "0123456789abcdef"

  /** Σ 16^i · digit_i over fp's first [[ValDigits]] hex chars —
    * identical CASE text on both engines. */
  private[graft] def hexValExpr(column: String): String =
    (1 to ValDigits).map { p =>
      val cases = HexDigits.zipWithIndex
        .map { case (c, v) => s"WHEN '$c' THEN $v" }
        .mkString(s"CASE substring($column, $p, 1) ", " ", " ELSE 0 END")
      s"${math.pow(16, ValDigits - p).toInt} * ($cases)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** The maintained view over a keyed row frame (doc_id, source, fp). */
  def viewOf(rows: DataFrame): DataFrame =
    rows.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr(hexValExpr("fp"))).as("fp_mass"))

  /** Incremental refresh: old view + δ(batch), with the before-image
    * probe against the CURRENT base rows (batch-sized key join).
    * batch schema: (doc_id, op ∈ insert|update|delete, fp = new value
    * or NULL for deletes, src = arriving source for inserts). */
  def maintain(view: DataFrame, rows: DataFrame, batch: DataFrame): DataFrame = {
    val before = rows.select(col("doc_id"), col("source").as("old_source"),
      expr(hexValExpr("fp")).as("old_val"))
    val mutations = batch.filter(col("op") =!= "insert")
      .join(before, Seq("doc_id"))
      .select(col("old_source").as("source"),
        when(col("op") === "delete", -1L).otherwise(0L).as("dn"),
        when(col("op") === "delete", -col("old_val"))
          .otherwise(expr(hexValExpr("fp")) - col("old_val")).as("dv"))
    val inserts = batch.filter(col("op") === "insert")
      .select(col("src").as("source"), lit(1L).as("dn"),
        expr(hexValExpr("fp")).as("dv"))
    val delta = mutations.unionAll(inserts)
      .groupBy("source").agg(sum("dn").as("dn"), sum("dv").as("dv"))
    view.join(delta, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_docs"),
        (coalesce(col("fp_mass"), lit(0L)) + coalesce(col("dv"), lit(0L))).as("fp_mass"))
      .filter(col("n_docs") > 0)
  }

  /** Keyed base rows with the Cdc fate digit, checkpointed once — the
    * base view, the batch, and the before-image probe all read the SAME
    * snapshot (three consumers — the multi-consumer invariant). */
  private def keyedRows(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("source"), expr(FpExpr).as("fp"))
      .withColumn("k", expr(KeyExpr))
      .localCheckpoint()

  /** The Cdc-convention synthetic batch, enriched with the arriving
    * source on inserts (a real insert event carries its payload). */
  private[graft] def syntheticBatch(keyed: DataFrame): DataFrame = {
    val deletes = keyed.filter(col("k").isin("0", "1"))
      .select(col("doc_id"), lit("delete").as("op"),
        lit(null).cast("string").as("fp"), lit(null).cast("string").as("src"))
    val updates = keyed.filter(col("k").isin("2", "3", "4"))
      .select(col("doc_id"), lit("update").as("op"),
        expr("md5(concat(fp, ':u'))").as("fp"), lit(null).cast("string").as("src"))
    val inserts = keyed.filter(col("k").isin("e", "f"))
      .select((col("doc_id") + 1000000L).as("doc_id"), lit("insert").as("op"),
        expr("md5(concat(fp, ':i'))").as("fp"), col("source").as("src"))
    deletes.unionAll(updates).unionAll(inserts)
  }

  def incrementalViewMaintainQ(documents: DataFrame): DataFrame = {
    val keyed = keyedRows(documents)
    val rows = keyed.select("doc_id", "source", "fp")
    maintain(viewOf(rows), rows, syntheticBatch(keyed)).orderBy("source")
  }

  /** Oracle: recompute the POST-batch state directly (the Cdc fate
    * convention) and aggregate it — agreement proves δ-maintenance
    * equals full recompute. */
  val incrementalViewMaintainSql: String = {
    val fpSql =
      "md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))"
    s"""WITH keyed AS (
       |  SELECT doc_id, source, $fpSql AS fp,
       |         substring(md5('graft-cdc:' || CAST(doc_id AS VARCHAR)), 1, 1) AS k
       |  FROM documents
       |), v1 AS (
       |  SELECT doc_id, source, fp FROM keyed
       |  WHERE k NOT IN ('0', '1', '2', '3', '4')
       |  UNION ALL
       |  SELECT doc_id, source, md5(fp || ':u') AS fp FROM keyed
       |  WHERE k IN ('2', '3', '4')
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, source, md5(fp || ':i') AS fp FROM keyed
       |  WHERE k IN ('e', 'f')
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(${hexValExpr("fp")}) AS BIGINT) AS fp_mass
       |FROM v1
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }
}
