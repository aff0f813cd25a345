package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.rsql

/** Cross-split NEAR-DUP leakage audit — the check a training pipeline runs
  * AFTER splitting and BEFORE training.
  *
  * [[TextOps.corpusSplit]] keys the train/val/test assignment on the
  * exact-dedup fingerprint, so byte-identical documents can never straddle
  * splits — but that guarantee is exact-match only. A near-duplicate pair
  * (one edit apart, re-wrapped boilerplate, template fills) hashes to two
  * independent fingerprints and straddles train/test with probability
  * 1 − (.8² + .1² + .1²) = 34%, silently inflating eval scores the same way
  * the exact-dup bug would (the leakage class the reference's bare
  * `randomSplit(0.8/0.2, seed)` at train_model.py:52 has no defense
  * against either). This operator reports every such pair: word-bigram
  * Jaccard ≥ τ pairs ([[Dedup.ngramJaccardPairs]] — the same exact pair
  * contract the dedup family verifies against) whose two members carry
  * DIFFERENT split labels, with both labels and the similarity evidence.
  * Downstream remediation is a pipeline policy choice (drop the non-train
  * member, or re-key the split on a cluster canonical); this query is the
  * audit that makes the leak visible and attributable.
  *
  * Complements [[Curation.contaminationCheck]]: that probes a FIXED
  * benchmark partition's 8-grams against the corpus; this audits the
  * pipeline's OWN split assignment against its own near-dup structure —
  * contamination you created, not contamination you inherited.
  *
  * Scale shape: cost is the exact pair miner's (inverted-index join,
  * Σ df² — the LSH twin drops in unchanged for the 100 TB path since the
  * banded family's recall-1 equality is spec-pinned); the split map pass
  * (two md5s per row) is recomputed per join side BY DESIGN rather than
  * materialized (the qualitySelect two-pass trade — two cheap map scans
  * beat checkpointing a corpus-wide frame), and the pair-side join-backs
  * are UNHINTED (the round-8 no-corpus-proportional-broadcast rule; the
  * aggregated pair frame is the small side and AQE broadcasts it from
  * real sizes).
  */
object SplitLeakage {

  /** Near-dup pairs (Jaccard ≥ threshold) whose members sit in different
    * splits: (id1, split1, id2, split2, n1, n2, inter, jaccard). */
  def splitLeakage(documents: DataFrame,
                   threshold: Double = Dedup.JaccardThreshold): DataFrame =
    leakageOverPairs(documents, Dedup.ngramJaccardPairs(documents, threshold))

  /** The audit fed from a persisted [[Dedup.pairIndex]] — the Σ df² mine
    * is replaced by a map+filter over the stored stats (round-12
    * mine-once economics; row-identity in InfraSpec). */
  def splitLeakageFromIndex(documents: DataFrame, index: DataFrame,
                            threshold: Double = Dedup.JaccardThreshold): DataFrame =
    leakageOverPairs(documents, Dedup.pairsFromIndex(index, threshold))

  private def leakageOverPairs(documents: DataFrame,
                               pairs: DataFrame): DataFrame = {
    val sp = TextOps.corpusSplit(documents).select(col("doc_id"), col("split"))
    pairs
      .join(sp.select(col("doc_id").as("id1"), col("split").as("split1")), Seq("id1"))
      .join(sp.select(col("doc_id").as("id2"), col("split").as("split2")), Seq("id2"))
      .filter(col("split1") =!= col("split2"))
  }

  def splitLeakageQ(documents: DataFrame): DataFrame =
    splitLeakage(documents)
      .select(col("id1"), col("split1"), col("id2"), col("split2"),
        col("n1"), col("n2"), col("inter"), Parity.r("jaccard", 4))
      .orderBy("id1", "id2")

  /** Oracle: the exact-pair CTE chain (one text with dedup_ngram_jaccard)
    * + the split-assignment CTE chain (one text with corpus_split). */
  val splitLeakageSql: String =
    s"""WITH ${Dedup.ngramJaccardSqlBody},
       |${TextOps.corpusSplitBodySql},
       |lp AS (
       |  SELECT id1, id2, n1, n2, inter,
       |         CAST(inter AS DOUBLE) / (n1 + n2 - inter) AS jaccard
       |  FROM rawpairs
       |  WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= ${Dedup.JaccardThreshold}
       |)
       |SELECT lp.id1, s1.split AS split1, lp.id2, s2.split AS split2,
       |       lp.n1, lp.n2, lp.inter, ${rsql("lp.jaccard", 4, "jaccard")}
       |FROM lp
       |JOIN sp s1 ON s1.doc_id = lp.id1
       |JOIN sp s2 ON s2.doc_id = lp.id2
       |WHERE s1.split <> s2.split
       |ORDER BY lp.id1, lp.id2""".stripMargin
}
