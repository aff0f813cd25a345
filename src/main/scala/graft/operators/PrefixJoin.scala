package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered exact Jaccard self-join (PPJoin-class candidate
  * generation) — the sub-quadratic upgrade of [[Dedup.ngramJaccardPairs]]
  * for corpora whose candidate cost Σ df(s)² is dominated by frequent
  * shingles. (Reference near-dup surface: eeg_features.py:71-84's
  * pairwise pandas similarity, re-expressed at corpus scale.)
  *
  * Principle (Bayardo et al. "Scaling Up All Pairs", Xiao et al. PPJoin —
  * public literature): order every document's shingle set by ONE global
  * total order (ascending document frequency, shingle hash as tie-break),
  * and keep only the first `p = nsh − ⌈τ·nsh⌉ + 1` tokens as the doc's
  * PREFIX. Any pair with J ≥ τ has overlap o ≥ τ·max(n1, n2) (from
  * J = o/(n1+n2−o) ≥ τ and o ≤ min(n1, n2)), and two sets whose prefixes
  * are disjoint can share at most ⌈τ·nsh⌉ − 1 < o tokens — take the side
  * whose last prefix element is globally smaller: every common token
  * inside its prefix would have to be > the OTHER side's last prefix
  * element ≥ its own, a contradiction, so all common tokens sit in its
  * ⌈τ·nsh⌉ − 1 suffix slots. Hence every qualifying pair shares a PREFIX
  * token, and the inverted-index self-join needs only the prefix index:
  * candidate cost drops from Σ df² to Σ df_prefix², and the global
  * ordering puts the HIGH-df shingles (the quadratic killers) at the END
  * of every document — exactly the ones the prefixes exclude. This is the
  * lossless counterpart of `maxDf` (which drops hot shingles and loses
  * recall): here hot shingles still participate via rare co-tokens.
  *
  * Exactness discipline: the prefix length must use an EXACT ceiling —
  * `⌈τ·nsh⌉` computed in floating point can round UP a representable
  * product (0.8·5 → 4.000000000000001 → ⌈⌉ = 5), SHRINKING the prefix and
  * silently dropping true pairs. τ is therefore carried as the rational
  * [[ThrNum]]/[[ThrDen]] and the ceiling is integer: `(num·nsh + den − 1)
  * div den`. Candidates are then EXACT-verified against the full shingle
  * sets (`array_intersect` on the strings, not the hashes), so the output
  * is row-identical to [[Dedup.ngramJaccardQ]] (spec-pinned) and the
  * registered query shares its DuckDB oracle verbatim.
  *
  * Plan shape: one shingle-keyed shuffle for the df counts, one
  * doc_id-keyed window for ranks (both window functions share the
  * partitioning — one exchange), a hash self-join over the PREFIX index
  * only, then two doc_id-keyed joins against the shingle-set frame for
  * the exact verify. No corpus-sized broadcast anywhere: all joins are
  * shuffled equi-joins sized by their keys (spec-pinned no
  * CartesianProduct / BroadcastNestedLoop). The exploded index feeds two
  * consumers (df agg + rank join) and is localCheckpoint'd per the
  * multi-consumer invariant.
  */
object PrefixJoin {

  /** τ = 4/5 = [[Dedup.JaccardThreshold]], as an exact rational. */
  val ThrNum = 4L
  val ThrDen = 5L

  /** Prefix index: (doc_id, sh) restricted to each doc's
    * `nsh − ⌈τ·nsh⌉ + 1` globally-rarest shingles. */
  private[graft] def prefixIndex(documents: DataFrame): DataFrame = {
    val ex = Dedup.shingleExploded(documents)
      .select(col("doc_id"), expr("xxhash64(s)").as("sh"))
      // two consumers (df aggregation + the rank join) — materialize once
      .localCheckpoint()
    val dfs = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    ex.join(dfs, Seq("sh"))
      .withColumn("rnk", row_number().over(byRarity))
      .withColumn("nsh", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("rnk") <=
        expr(s"nsh - (($ThrNum * nsh + $ThrDen - 1) div $ThrDen) + 1"))
      .select(col("doc_id"), col("sh"))
  }

  /** Candidate pairs: docs sharing ≥1 prefix token. A strict subset of
    * the full inverted-index candidate set; exposed for the reduction
    * measurement in the spec. */
  private[graft] def candidates(documents: DataFrame): DataFrame = {
    val pref = prefixIndex(documents)
    pref.select(col("doc_id").as("id1"), col("sh"))
      .join(pref.select(col("doc_id").as("id2"), col("sh")), Seq("sh"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Exact Jaccard ≥ τ pairs, prefix-filtered. Row-identical to
    * [[Dedup.ngramJaccardPairs]] at the default threshold. */
  def prefixJaccardPairs(documents: DataFrame): DataFrame = {
    val sets = Dedup.shingleSets(documents)
    candidates(documents)
      .join(sets.select(col("doc_id").as("id1"), col("shingles").as("s1"),
        col("nsh").as("n1")), Seq("id1"))
      .join(sets.select(col("doc_id").as("id2"), col("shingles").as("s2"),
        col("nsh").as("n2")), Seq("id2"))
      .withColumn("inter",
        expr("CAST(size(array_intersect(s1, s2)) AS BIGINT)"))
      .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / (n1 + n2 - inter)"))
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .select("id1", "id2", "n1", "n2", "inter", "jaccard")
  }

  /** Registered form — same projection/rounding/order as
    * [[Dedup.ngramJaccardQ]]; shares `ngramJaccardSql` as its oracle. */
  def prefixJaccardQ(documents: DataFrame): DataFrame =
    prefixJaccardPairs(documents)
      .select(col("id1"), col("id2"), col("n1"), col("n2"), col("inter"),
        Parity.r("jaccard", 4))
      .orderBy("id1", "id2")
}
