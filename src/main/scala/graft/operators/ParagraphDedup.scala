package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Paragraph-granularity dedup (round 8) — the standard pretraining
  * SUB-document dedup pass: a doc that is mostly stitched from content
  * other docs already contributed should be gated even when no whole-doc
  * fingerprint or shingle-Jaccard pair fires (boilerplate headers, quoted
  * replies, template pages).
  *
  * Both granularities ship behind one dial: fixed token windows (the
  * registered query — works on any corpus) and blank-line paragraphs
  * (`blankLine = true`, the standard web-corpus form: split on 2+
  * newlines, per-paragraph whitespace/case normalization so re-wrapped
  * copies fingerprint identically — spec-pinned). Everything downstream
  * of the generator is granularity-agnostic.
  *
  * Semantics: tokenize (same split as every text operator), cut into
  * consecutive [[ParaWindowTokens]]-token windows (last window short),
  * fingerprint each window (md5 of the space-joined tokens — already
  * whitespace-normalized by construction), and mark a window a DUPLICATE
  * iff an identical window occurs at a strictly earlier (doc_id,
  * para_idx) position — the same ingest-order "duplicate of earlier"
  * convention as [[Curation.docNovelty]]. Per doc, the rollup is the
  * dup-window fraction and the admission gate
  * `dup_para_frac <= `[[DupParaMax]].
  *
  * Scale shape: the exploded (doc_id, para_idx, fp) index is materialized
  * ONCE (localCheckpoint; at 100 TB: the persisted fp-bucketed paragraph
  * index, the same asset class as the gram/LSH indexes dedup already
  * keeps) because it genuinely feeds two consumers — the first-occurrence
  * aggregation and the verdict join. First-occurrence is ONE
  * fingerprint-keyed aggregation (`min(struct(doc_id, para_idx))` — ≤ one
  * row per distinct window), joined back fp-keyed: one fingerprint
  * shuffle + one broadcast-sized-or-shuffled dim join, never any pairwise
  * comparison — |windows| log-linear at any corpus size, the
  * [[TextOps.dedupExact]] economics applied per window. The window
  * array is built with a filter-over-index-transform rather than
  * `sequence(0, n-1)` because Spark's `sequence` runs DESCENDING when the
  * stop is below the start — an empty token array would generate [0, -1]
  * instead of nothing.
  *
  * Degenerate convention (both engines): NULL/empty text → zero windows →
  * n_paras 0, n_dup_paras 0, frac 0.0, keep=true (left join + coalesce,
  * as in contamination/novelty).
  *
  * Reference relation: the reference dedups nothing sub-record (its EEG
  * rows are atomic); this extends the corpus-dedup family the way §2.C
  * 28-30 extend `dedup_exact`.
  */
object ParagraphDedup {

  /** Window width in tokens. 8 matches the decontamination gram width:
    * long enough that chance window collisions vanish at corpus scale,
    * short enough that a copied passage still aligns on some window. */
  val ParaWindowTokens = 8

  /** Admission gate: reject a doc once more than this fraction of its
    * windows duplicates earlier content (measured on the gate corpus:
    * planted near-dup copies score ≥ 0.7, light boilerplate overlap
    * < 0.3, fresh docs 0). */
  val DupParaMax = 0.3

  /** Window array over `w` (the coalesced token array): one space-joined
    * string per consecutive `width`-token window. Start indices come from
    * filtering the 0-based index transform — NOT `sequence`, which turns
    * descending on empty input (see object scaladoc). */
  private[graft] def paraArrayExpr(width: Int): String =
    s"transform(filter(transform(w, (x, i) -> i), i -> i % $width = 0), " +
      s"s -> array_join(slice(w, s + 1, $width), ' '))"

  /** Blank-line paragraph array over raw `text`: split on 2+ newlines,
    * whitespace-normalize each paragraph (lower + collapse + trim — the
    * [[TextOps.docFingerprint]] normalization applied per paragraph, so
    * re-wrapped copies of the same paragraph fingerprint identically),
    * drop empties. The standard web-corpus granularity; the fixed-window
    * form is the fallback for flat token streams like this corpus. */
  private[graft] val BlankLineParaExpr: String =
    """filter(
      |  transform(split(text, '\\n{2,}'),
      |            p -> trim(lower(regexp_replace(p, '\\s+', ' ')))),
      |  p -> p != '')""".stripMargin

  /** Exploded (doc_id, para_idx, fp) paragraph stream; the paragraph
    * expression stays INLINE at the generator (the Generate-child
    * discipline every production explode site follows — a named column
    * would get an inferred filter recomputing the array at the scan).
    * `blankLine = true` switches the generator from fixed token windows
    * to blank-line paragraphs — everything downstream (first-occurrence,
    * verdicts, rollup, incremental probe) is granularity-agnostic. */
  private[graft] def paragraphExploded(documents: DataFrame,
                                       width: Int = ParaWindowTokens,
                                       blankLine: Boolean = false): DataFrame = {
    val base =
      if (blankLine) documents.select(col("doc_id"), col("text"))
        .select(col("doc_id"), posexplode(expr(BlankLineParaExpr)))
      else documents
        .select(col("doc_id"),
          expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
        .select(col("doc_id"), posexplode(expr(paraArrayExpr(width))))
    base.select(col("doc_id"), col("pos").cast("int").as("para_idx"),
      expr("md5(col)").as("fp"))
  }

  /** Per-window duplicate-of-earlier verdicts — the sub-document analog of
    * [[TextOps.dedupExact]]'s canonical marking. Exposed for the rollup
    * and for specs; `first_doc`/`first_idx` attribute each duplicate to
    * the window it copies. */
  def paragraphVerdicts(documents: DataFrame,
                        width: Int = ParaWindowTokens,
                        blankLine: Boolean = false): DataFrame = {
    val ex = paragraphExploded(documents, width, blankLine).localCheckpoint()
    val firsts = ex.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("first"))
      .select(col("fp"), col("first.doc_id").as("first_doc"),
        col("first.para_idx").as("first_idx"))
    ex.join(firsts, Seq("fp"))
      .withColumn("is_dup",
        !(col("doc_id") === col("first_doc") && col("para_idx") === col("first_idx")))
  }

  /** Per-doc rollup + admission gate. */
  def paragraphDedup(documents: DataFrame,
                     width: Int = ParaWindowTokens,
                     maxDupFrac: Double = DupParaMax,
                     blankLine: Boolean = false): DataFrame = {
    val agg = paragraphVerdicts(documents, width, blankLine)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("np"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("nd"))
    documents.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .withColumn("n_paras", coalesce(col("np"), lit(0L)))
      .withColumn("n_dup_paras", coalesce(col("nd"), lit(0L)))
      .withColumn("dup_para_frac",
        expr("CAST(n_dup_paras AS DOUBLE) / greatest(n_paras, 1)"))
      .withColumn("keep_paragraphs", col("dup_para_frac") <= maxDupFrac)
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
        col("dup_para_frac"), col("keep_paragraphs"))
  }

  /** Incremental (per-batch) paragraph admission — the sub-document twin
    * of [[Dedup.dedupIncremental]]: for each BATCH doc (the
    * [[Dedup.IncrementalBatchMod]] doc_id % 5 == 0 stand-in), the fraction
    * of its windows already present anywhere in the EXISTING corpus, and
    * the admission verdict `is_new = hit_frac <= maxHitFrac`. This is the
    * form a daily ingest actually runs: the corpus paragraph-fingerprint
    * index is the asset (at 100 TB: persisted DISTINCT-fp table bucketed
    * by fp — built once, amortized across every future batch, the
    * InfraSpec persisted-index economics), and each batch pays only its
    * own window stream: one fp-keyed probe join whose shuffled side is
    * batch-sized, plus the per-batch-doc count aggregation. No
    * batch-internal comparison (that is [[paragraphDedup]] run on the
    * admitted batch afterwards) and no corpus×corpus work ever.
    *
    * Hits count window INSTANCES (a doc repeating a known window twice
    * scores 2 hits of 2 windows), mirroring the rollup convention of
    * [[paragraphDedup]]; degenerate batch docs (no windows) re-enter at
    * the final left join as 0/0/0.0/is_new = true.
    *
    * `bloomFpp` (round 8) is the SEMI-JOIN REDUCTION dial: with a steady
    * corpus, the overwhelming share of a daily batch's windows are brand
    * new — rows that pay the fp-keyed probe shuffle only to LEFT-join
    * onto nothing. With `bloomFpp = Some(p)`, a Bloom filter over the
    * corpus index fps (built distributed via `stat.bloomFilter`'s
    * aggregate, held ~1.2 GB/10⁹ fps at p=.01, broadcast once per index
    * rebuild like the LSH bucket index) pre-classifies each batch window:
    * `mightContain = false` proves fp ∉ corpus — the row takes hit 0
    * directly and SKIPS the join; only the `true` slice (true dups + a
    * p-bounded false-positive sliver) pays the shuffle. Bloom false
    * negatives are impossible, false positives are resolved by the join
    * they are sent to — output is row-identical to the plain path
    * (spec-pinned), making this a pure economics dial: per-row O(k)
    * hashes against a broadcast bitmap instead of a shuffle, on the slice
    * that dominates at scale. The filter is a closure over the broadcast
    * sketch (not codegen); it runs on the batch side only, before the
    * exchange it exists to shrink. */
  def paragraphIncremental(documents: DataFrame,
                           width: Int = ParaWindowTokens,
                           batchMod: Long = Dedup.IncrementalBatchMod,
                           maxHitFrac: Double = DupParaMax,
                           bloomFpp: Option[Double] = None): DataFrame = {
    val ex = paragraphExploded(documents, width)
    val batch = ex.filter(col("doc_id") % batchMod === 0)
      .select(col("doc_id"), col("fp"))
    val corpusIdx = ex.filter(col("doc_id") % batchMod =!= 0)
      .select(col("fp")).distinct()
      .withColumn("hit", lit(1L))
    val probed = bloomFpp match {
      case None => batch.join(corpusIdx, Seq("fp"), "left")
      case Some(fpp) =>
        // two corpus-index consumers (count + sketch build) before the
        // join — checkpoint so the explode+distinct runs once (§invariants)
        val idx = corpusIdx.localCheckpoint()
        val spark = documents.sparkSession
        val bloom = idx.stat.bloomFilter("fp", math.max(idx.count(), 1L), fpp)
        val bc = spark.sparkContext.broadcast(bloom)
        val might = udf((s: String) => bc.value.mightContainString(s))
        val definitelyNew = batch.filter(!might(col("fp")))
          .withColumn("hit", expr("CAST(NULL AS BIGINT)"))
        batch.filter(might(col("fp"))).join(idx, Seq("fp"), "left")
          .unionByName(definitelyNew)
    }
    val stats = probed
      .groupBy("doc_id")
      .agg(count(lit(1)).as("np"), sum(coalesce(col("hit"), lit(0L))).as("nh"))
    documents.filter(col("doc_id") % batchMod === 0).select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .withColumn("n_paras", coalesce(col("np"), lit(0L)))
      .withColumn("n_hit", coalesce(col("nh"), lit(0L)))
      .withColumn("hit_frac", expr("CAST(n_hit AS DOUBLE) / greatest(n_paras, 1)"))
      .withColumn("is_new", col("hit_frac") <= maxHitFrac)
      .select(col("doc_id"), col("n_paras"), col("n_hit"),
        col("hit_frac"), col("is_new"))
  }

  def paragraphIncrementalQ(documents: DataFrame): DataFrame =
    paragraphIncremental(documents)
      .select(col("doc_id"), col("n_paras"), col("n_hit"),
        r("hit_frac", 4), col("is_new"))
      .orderBy("doc_id")

  /** DuckDB twin of [[paragraphIncremental]] — same window comprehension
    * as [[paragraphDedupSql]], corpus side as a DISTINCT window set. */
  val paragraphIncrementalSql: String = {
    val wdt = ParaWindowTokens
    val mod = Dedup.IncrementalBatchMod
    s"""WITH toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |         [array_to_string(w[s*$wdt+1 : s*$wdt+$wdt], ' ')
       |          for s in range(0, CAST(ceil(len(w) / $wdt.0) AS BIGINT))] AS paras
       |  FROM toks
       |), ex AS (
       |  SELECT doc_id, unnest(paras) AS para FROM g
       |), corpus AS (
       |  SELECT DISTINCT para FROM ex WHERE doc_id % $mod <> 0
       |), stats AS (
       |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS np,
       |         CAST(sum(CASE WHEN c.para IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nh
       |  FROM ex e LEFT JOIN corpus c ON c.para = e.para
       |  WHERE e.doc_id % $mod = 0
       |  GROUP BY 1
       |), j AS (
       |  SELECT d.doc_id, COALESCE(np, 0) AS n_paras, COALESCE(nh, 0) AS n_hit
       |  FROM documents d LEFT JOIN stats ON stats.doc_id = d.doc_id
       |  WHERE d.doc_id % $mod = 0
       |)
       |SELECT doc_id, n_paras, n_hit,
       |       ${rsql("CAST(n_hit AS DOUBLE) / greatest(n_paras, 1)", 4, "hit_frac")},
       |       CAST(n_hit AS DOUBLE) / greatest(n_paras, 1) <= $DupParaMax AS is_new
       |FROM j
       |ORDER BY doc_id""".stripMargin
  }

  def paragraphDedupQ(documents: DataFrame): DataFrame =
    paragraphDedup(documents)
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
        r("dup_para_frac", 4), col("keep_paragraphs"))
      .orderBy("doc_id")

  /** DuckDB twin: same windows via a list comprehension over window
    * starts (`range(0, ceil(len/width))` — DuckDB `range` is empty when
    * stop ≤ start, so the empty-doc case needs no guard), same md5
    * fingerprints, first occurrence via the two-step min (min doc, then
    * min idx within that doc) — an independent formulation of the
    * lexicographic `min(struct(...))`. */
  val paragraphDedupSql: String = {
    val wdt = ParaWindowTokens
    s"""WITH toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |         [array_to_string(w[s*$wdt+1 : s*$wdt+$wdt], ' ')
       |          for s in range(0, CAST(ceil(len(w) / $wdt.0) AS BIGINT))] AS paras
       |  FROM toks
       |), ex AS (
       |  SELECT doc_id, CAST(unnest(range(len(paras))) AS INT) AS para_idx,
       |         md5(unnest(paras)) AS fp
       |  FROM g
       |), f1 AS (
       |  SELECT fp, min(doc_id) AS first_doc FROM ex GROUP BY 1
       |), f2 AS (
       |  SELECT ex.fp, min(ex.para_idx) AS first_idx
       |  FROM ex JOIN f1 ON ex.fp = f1.fp AND ex.doc_id = f1.first_doc
       |  GROUP BY 1
       |), v AS (
       |  SELECT ex.doc_id,
       |         (ex.doc_id <> f1.first_doc OR ex.para_idx <> f2.first_idx) AS is_dup
       |  FROM ex JOIN f1 USING (fp) JOIN f2 USING (fp)
       |), a AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS np,
       |         CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS nd
       |  FROM v GROUP BY 1
       |), j AS (
       |  SELECT d.doc_id, COALESCE(np, 0) AS n_paras, COALESCE(nd, 0) AS n_dup_paras
       |  FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id
       |)
       |SELECT doc_id, n_paras, n_dup_paras,
       |       ${rsql("CAST(n_dup_paras AS DOUBLE) / greatest(n_paras, 1)", 4, "dup_para_frac")},
       |       CAST(n_dup_paras AS DOUBLE) / greatest(n_paras, 1) <= $DupParaMax AS keep_paragraphs
       |FROM j
       |ORDER BY doc_id""".stripMargin
  }
}
