package graft.operators

import org.apache.spark.sql.DataFrame
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
    * identical result because the Spark sentinel always loses to it). */
  val winnowFingerprintSql: String = {
    val (k, w) = (GramTokens, WindowGrams)
    s"""WITH tok AS (
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
       |)
       |SELECT DISTINCT doc_id, CAST(s.p AS BIGINT) AS pos, s.h AS fp
       |FROM (SELECT doc_id, unnest(picks) AS s FROM sel)
       |ORDER BY doc_id, pos""".stripMargin
  }
}
