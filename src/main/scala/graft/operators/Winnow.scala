package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (round 8) — the MOSS local fingerprint
  * selection scheme (Schleimer, Wilkerson & Aiken, SIGMOD 2003): hash
  * every k-token gram, slide a window of `w` consecutive gram hashes, and
  * in each window select the MINIMUM hash, breaking ties by the RIGHTMOST
  * position; the distinct selected (position, hash) pairs are the doc's
  * fingerprint set. The guarantee the scheme is chosen for: any shared
  * run of at least w + k − 1 tokens between two documents is caught by at
  * least one common fingerprint, while only ~2/(w+1) of all gram hashes
  * are kept — a fixed-density sketch that, unlike [[Lsh]] minhash (a
  * whole-doc similarity sketch), LOCALIZES each match to a position. This
  * is the overlap-detection index a clone/plagiarism/attribution pass
  * builds; [[DupPassages]] answers "what is our boilerplate" at fixed
  * window granularity, winnowing answers "do these two docs share ANY
  * sufficiently long run, and where".
  *
  * Hash convention: first 8 hex chars of md5 over the space-joined
  * lower-normalized gram ([[TextOps.docFingerprint]]'s normalization
  * applied per gram, so re-cased/re-wrapped copies fingerprint
  * identically). Minimum is taken LEXICOGRAPHICALLY on the fixed-width
  * lowercase hex — equal-length strings make lexicographic = numeric, and
  * both engines compare ASCII identically, so no hex→int conversion
  * builtin is needed (the [[Sampling]] rule).
  *
  * Degenerate convention: docs with fewer than k tokens have no grams and
  * emit NO rows (sparse-by-contract, the [[DupSpans]] shape); docs with
  * 0 < n_grams < w yield one window over all grams. NULL/empty text →
  * no rows; the operator stays total.
  *
  * Scale shape: pure map + inline generator — per-doc independent work,
  * ZERO exchanges before the output sort (spec-pinned, the [[DocChunk]]
  * plan class). Window starts come from a filtered index transform, NOT
  * `sequence()` (descending on empty input — the §invariants rule); the
  * selection fold is a bounded `aggregate` over a w-length slice with a
  * sentinel accumulator ('~' sorts above every hex char) so the empty
  * case never fires a CASE at the generator position. At 100 TB the
  * output is the position-localized fingerprint index, written
  * partitioned by fp bucket next to the gram/LSH indexes dedup keeps.
  */
object Winnow {

  /** Gram width in tokens: matches [[Dedup]]'s bigram-shingle convention
    * scaled to the guarantee target — with w = 4, any shared run of
    * w + k − 1 = 7 tokens is caught. */
  val GramTokens = 4

  /** Window width in grams (selection density ~2/(w+1) = 0.4). */
  val WindowGrams = 4

  /** (hash, 0-based gram position) struct array over the token array `w`:
    * gram starts are `i <= size(w) − k` from the index transform. */
  private def hpExpr(k: Int): String =
    s"""transform(
       |  transform(
       |    filter(transform(w, (x, i) -> i), i -> i <= size(w) - $k),
       |    s -> substring(md5(array_join(slice(w, s + 1, $k), ' ')), 1, 8)),
       |  (h, i) -> named_struct('h', h, 'p', i))""".stripMargin

  /** Distinct selected (h, p) per doc: window starts are every hp index
    * `s <= greatest(size − w, 0)` (so a short gram list gets exactly one
    * window and an empty one gets none); each window folds to its
    * rightmost-min element. */
  private def selExpr(w: Int): String =
    s"""array_distinct(
       |  transform(
       |    filter(transform(hp, (x, i) -> i), i -> i <= greatest(size(hp) - $w, 0)),
       |    s -> aggregate(
       |      slice(hp, s + 1, least($w, size(hp) - s)),
       |      named_struct('h', '~', 'p', -1),
       |      (acc, x) -> IF(x.h < acc.h OR (x.h = acc.h AND x.p > acc.p), x, acc))))""".stripMargin

  def winnowFingerprint(documents: DataFrame,
                        k: Int = GramTokens, w: Int = WindowGrams): DataFrame =
    documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
      .select(col("doc_id"), expr(hpExpr(k)).as("hp"))
      .select(col("doc_id"), explode(expr(selExpr(w))).as("s"))
      .select(col("doc_id"), col("s.p").cast("bigint").as("pos"),
        col("s.h").as("fp"))

  def winnowFingerprintQ(documents: DataFrame): DataFrame =
    winnowFingerprint(documents).orderBy("doc_id", "pos")

  /** DuckDB twin: same gram hashes, same filtered-index window starts,
    * same rightmost-min fold (list_reduce seeds from the first element —
    * identical result because the Spark sentinel always loses to it).
    * The CTE chain is shared verbatim with [[winnowOverlapSql]] (the
    * tokenize_ids nesting rule: one text, the index definition can't
    * drift between the producer and its consumer). */
  private val winnowCtes: String = {
    val (k, w) = (GramTokens, WindowGrams)
    s"""tok AS (
       |  SELECT doc_id,
       |         COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |         [substr(md5(array_to_string(w[s + 1 : s + $k], ' ')), 1, 8)
       |          for s in [i for i in range(0, len(w)) if i <= len(w) - $k]] AS hs
       |  FROM tok
       |), hpt AS (
       |  SELECT doc_id,
       |         [{'h': hs[i], 'p': i - 1} for i in range(1, len(hs) + 1)] AS hp
       |  FROM g
       |), sel AS (
       |  SELECT doc_id,
       |         [list_reduce(hp[s + 1 : s + least($w, len(hp) - s)],
       |            (acc, x) -> CASE WHEN x.h < acc.h OR (x.h = acc.h AND x.p > acc.p)
       |                        THEN x ELSE acc END)
       |          for s in [i for i in range(0, len(hp)) if i <= greatest(len(hp) - $w, 0)]] AS picks
       |  FROM hpt
       |), fps AS (
       |  SELECT DISTINCT doc_id, CAST(s.p AS BIGINT) AS pos, s.h AS fp
       |  FROM (SELECT doc_id, unnest(picks) AS s FROM sel)
       |)""".stripMargin
  }

  val winnowFingerprintSql: String =
    s"""WITH $winnowCtes
       |SELECT doc_id, pos, fp FROM fps
       |ORDER BY doc_id, pos""".stripMargin

  // ---------------------------------------------------------- winnow_overlap

  /** Pairs sharing fewer fingerprints than this never surface (kills the
    * single-collision noise floor; with w + k − 1 = 7-token guaranteed
    * coverage, two genuine shared passages produce ≥ 2 picks). */
  val MinSharedFps = 2

  /** Pairwise document OVERLAP via the winnow index — the consumer that
    * makes [[winnowFingerprint]] actionable: for every document pair
    * sharing ≥ [[MinSharedFps]] distinct fingerprints, the shared count,
    * each side's index size, and the CONTAINMENT score
    * `n_shared / min(n1, n2)` — the asymmetric measure that catches a
    * short doc wholly embedded in a long one, which whole-doc Jaccard
    * ([[Dedup.ngramJaccardPairs]]) structurally under-scores (the
    * min-side normalizer, not the union). This is the clone/attribution
    * report winnowing exists to feed; Jaccard dedup answers "are these
    * docs mostly the same", containment-over-winnow answers "does one
    * contain a substantial run of the other".
    *
    * Scale shape: [[Dedup.ngramJaccardPairs]]' inverted-index economics
    * with the winnow density advantage — the self-join costs Σ df(fp)²
    * over an index that keeps only ~2/(w+1) of all grams, so the
    * candidate stage is ~(2/(w+1))² ≈ 0.16× the raw-gram equivalent at
    * identical guarantee width. The distinct (doc, fp) frame feeds THREE
    * consumers (sizes + both join sides) → localCheckpoint per the
    * invariant. Size join-backs ride AFTER the pair aggregation and are
    * UNHINTED (the round-8 no-corpus-proportional-broadcast rule — AQE
    * broadcasts at gate scale, shuffles on a giant corpus). Hot
    * boilerplate fps inherit Dedup's dials at need (df cap / hot-key
    * salting); the gate corpus has no fp hot enough to qualify. */
  def winnowOverlap(documents: DataFrame,
                    minShared: Int = MinSharedFps): DataFrame = {
    val fps = winnowFingerprint(documents)
      .select(col("doc_id"), col("fp")).distinct().localCheckpoint()
    val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
    val a = fps.select(col("doc_id").as("id1"), col("fp"))
    val b = fps.select(col("doc_id").as("id2"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col("doc_id").as("id1"), col("nfp").as("n1")), Seq("id1"))
      .join(sizes.select(col("doc_id").as("id2"), col("nfp").as("n2")), Seq("id2"))
      .withColumn("containment",
        expr("CAST(n_shared AS DOUBLE) / CAST(least(n1, n2) AS DOUBLE)"))
      .select(col("id1"), col("id2"), col("n_shared"), col("n1"), col("n2"),
        col("containment"))
  }

  def winnowOverlapQ(documents: DataFrame): DataFrame =
    winnowOverlap(documents)
      .select(col("id1"), col("id2"), col("n_shared"), col("n1"), col("n2"),
        Parity.r("containment", 4))
      .orderBy("id1", "id2")

  val winnowOverlapSql: String =
    s"""WITH $winnowCtes, dfp AS (
       |  SELECT DISTINCT doc_id, fp FROM fps
       |), sizes AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp FROM dfp GROUP BY doc_id
       |), prs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM dfp a JOIN dfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT id1, id2, n_shared, s1.nfp AS n1, s2.nfp AS n2,
       |       ${Parity.rsql("CAST(n_shared AS DOUBLE) / CAST(least(s1.nfp, s2.nfp) AS DOUBLE)", 4, "containment")}
       |FROM prs
       |JOIN sizes s1 ON s1.doc_id = id1
       |JOIN sizes s2 ON s2.doc_id = id2
       |WHERE n_shared >= $MinSharedFps
       |ORDER BY id1, id2""".stripMargin

  // ------------------------------------------------------------ winnow_align

  /** Spans sharing fewer matched fingerprints than this are dropped — the
    * single-collision noise floor, [[MinSharedFps]]'s per-span analog. */
  val MinAlignFps = 2

  /** ALIGNED MATCH SPANS — the actual MOSS report: [[winnowOverlap]] says
    * two docs share material, this says WHERE — maximal aligned extents
    * `[start1, end1) ↔ [start2, end2)` (token bounds, end exclusive) with
    * the matched-fingerprint count per span. The output an attribution /
    * plagiarism / quotation-mining pass consumes, and the winnow-index
    * sibling of [[DupSpans]] (which merges fixed-window verdicts within ONE
    * doc; this aligns runs BETWEEN doc pairs).
    *
    * Semantics: matched picks join per-position ((doc, pos, fp) — NOT the
    * (doc, fp)-distinct overlap frame: a fp repeated in both docs matches
    * at every position pair); a true shared run puts all its matches on one
    * DIAGONAL `pos1 − pos2`, and within a (id1, id2, diag) group the
    * winnowing density guarantee bounds the gap between consecutive picks
    * of a contiguous shared run by w grams — so spans are gaps-and-islands
    * over pos1 with gap tolerance w (lag-flag + running sum, all-integer;
    * the [[DupSpans]] family shape with a tolerance instead of adjacency).
    * Same-diagonal coincidental matches farther apart than w start new
    * islands and die at the [[MinAlignFps]] floor. Window edge effects
    * (picks near run boundaries depend on context outside the run) shorten
    * a reported span by at most w grams per side — the winnowing trade, not
    * a bug; the guarantee direction is: any shared run of ≥ w + k − 1
    * tokens yields ≥ 1 matched pick, and interior picks of long runs match
    * exactly.
    *
    * Token bounds: a pick at gram position p covers tokens [p, p + k);
    * span side 2 derives from the diagonal (start2 = start1 − diag), so
    * `text1.tokens[start1, end1) == text2.tokens[start2, end2)` holds
    * exactly for interior extents (spec-pinned slice-equality on every
    * emitted span at gap width w; md5-collision-free on any real corpus).
    *
    * Scale shape: the per-position index has two join consumers →
    * localCheckpoint ([[winnowOverlap]]'s rule); the fp-keyed self-join is
    * the same Σ df(fp)² candidate stage at winnow density; the island
    * window and the (id1, id2, diag, grp) aggregation share ONE exchange
    * (hash(id1, id2, diag) satisfies the grouping — the [[DupSpans]]
    * argument). Span rows ≤ matches/2; size frames never materialize. */
  def winnowAlign(documents: DataFrame,
                  k: Int = GramTokens, w: Int = WindowGrams,
                  minFps: Int = MinAlignFps): DataFrame = {
    val fps = winnowFingerprint(documents, k, w).localCheckpoint()
    val m = fps.select(col("doc_id").as("id1"), col("pos").as("pos1"), col("fp"))
      .join(fps.select(col("doc_id").as("id2"), col("pos").as("pos2"), col("fp")),
        Seq("fp"))
      .filter(col("id1") < col("id2"))
      .withColumn("diag", col("pos1") - col("pos2"))
    val wD = Window.partitionBy("id1", "id2", "diag").orderBy("pos1")
    m.withColumn("prev", lag("pos1", 1).over(wD))
      .withColumn("brk",
        when(col("prev").isNull || col("pos1") - col("prev") > w, 1).otherwise(0))
      .withColumn("grp", sum("brk").over(
        wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("id1", "id2", "diag", "grp")
      .agg(count(lit(1)).as("n_fps"),
        min("pos1").as("start1"), max("pos1").as("maxp1"))
      .filter(col("n_fps") >= minFps)
      .select(col("id1"), col("id2"),
        col("start1"), (col("maxp1") + k).as("end1"),
        (col("start1") - col("diag")).as("start2"),
        (col("maxp1") + k - col("diag")).as("end2"),
        col("n_fps"))
  }

  def winnowAlignQ(documents: DataFrame): DataFrame =
    winnowAlign(documents).orderBy("id1", "id2", "start1", "start2")

  /** DuckDB twin: the shared [[winnowCtes]] index (per-position `fps`, NOT
    * the distinct frame), then the same diagonal islands — lag flag +
    * running sum spelled ROWS, all-integer. */
  val winnowAlignSql: String = {
    val (k, w) = (GramTokens, WindowGrams)
    s"""WITH $winnowCtes, m AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |         a.pos AS pos1, b.pos AS pos2, a.pos - b.pos AS diag
       |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |), l AS (
       |  SELECT m.*,
       |         lag(pos1) OVER (PARTITION BY id1, id2, diag ORDER BY pos1) AS prev
       |  FROM m
       |), isl AS (
       |  SELECT l.*,
       |         CAST(sum(CASE WHEN prev IS NULL OR pos1 - prev > $w THEN 1 ELSE 0 END)
       |              OVER (PARTITION BY id1, id2, diag ORDER BY pos1
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
       |  FROM l
       |), sp AS (
       |  SELECT id1, id2, diag, grp, CAST(count(*) AS BIGINT) AS n_fps,
       |         min(pos1) AS start1, max(pos1) AS maxp1
       |  FROM isl GROUP BY 1, 2, 3, 4
       |)
       |SELECT id1, id2, start1, maxp1 + $k AS end1,
       |       start1 - diag AS start2, maxp1 + $k - diag AS end2, n_fps
       |FROM sp
       |WHERE n_fps >= $MinAlignFps
       |ORDER BY id1, id2, start1, start2""".stripMargin
  }
}
