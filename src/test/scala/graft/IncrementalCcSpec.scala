package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Incremental CC maintenance: a batch doc WELDS two previously-separate
  * corpus components through the label graph, and the result equals the
  * from-scratch clustering exactly — on a hand-built fixture whose
  * Jaccards are computed in the comment, so the merge is forced, not
  * incidental. */
class IncrementalCcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // M = w0..w20 (20 distinct bigrams). A drops M's last 2 bigrams, adds
  // 2 unique -> j(M,A) = 18/22 = 0.818 >= 0.8; B drops M's first 2,
  // adds 2 unique -> j(M,B) = 0.818; but j(A,B) = 16/24 = 0.667 < 0.8.
  // So corpus {A, B} forms TWO components; batch doc M bridges them.
  private val w = (0 to 20).map(i => s"w$i")
  private val mTxt = w.mkString(" ")
  private val aTxt = (w.take(19) ++ Seq("aa1", "aa2")).mkString(" ")
  private val bTxt = (Seq("bb1", "bb2") ++ w.drop(2)).mkString(" ")

  private def labels(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("batch bridge merges two old components; result equals the full clustering") {
    // ids: corpus 1, 2 (not % 5 == 0), batch 5; plus an untouched
    // corpus singleton 3 whose label must not move
    val docs = Seq((1L, aTxt), (2L, bTxt), (3L, "lone text here"), (5L, mTxt))
      .toDF("doc_id", "text")
    val corpusOnly = docs.filter($"doc_id" % 5 =!= 0)
    val before = labels(Dedup.dedupClusters(corpusOnly))
    assert(before(1L) != before(2L), "fixture broken: A and B must start separate")
    val inc = labels(Dedup.dedupClustersIncremental(docs))
    val full = labels(Dedup.dedupClusters(docs))
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc(1L) == 1L && inc(2L) == 1L && inc(5L) == 1L,
      s"bridge must weld {1,2,5} under min-id 1: $inc")
    assert(inc(3L) == 3L, "untouched singleton must keep its label")
  }

  test("no batch rows: labels are exactly the corpus labels") {
    val docs = Seq((1L, aTxt), (2L, bTxt)).toDF("doc_id", "text")
    assert(labels(Dedup.dedupClustersIncremental(docs)) ==
      labels(Dedup.dedupClusters(docs)))
  }

  // ---------------------------------------------- semantic (embedding) side

  private def vecLabels(df: DataFrame): Map[Long, Long] =
    df.select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("semantic: batch bridge welds two old components; batch×batch forms a NEW cluster") {
    // cos ≥ 0.4 gate. Corpus: A=(1,0,0,0), B=(0,1,0,0) orthogonal (two
    // components), C=(0,0,1,0) singleton. Batch: M=(1,1,0,0) — cos(M,A)
    // = cos(M,B) = 1/√2 ≈ 0.707 welds them; P1=(0,0,0,1), P2=(0,0,0.1,1)
    // — cos(P1,P2) ≈ 0.995 but cos(P2,C) ≈ 0.0995 < 0.4: a brand-new
    // cluster whose ONLY edge is batch×batch (the class admission never
    // mines but the CC merge must).
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(1f, 1f, 0f, 0f)),
      (10L, Seq(0f, 0f, 0f, 1f)), (15L, Seq(0f, 0f, 0.1f, 1f)))
      .toDF("vec_id", "embedding")
    val before = vecLabels(Similarity.embeddingClusters(
      emb.filter($"vec_id" % 5 =!= 0)))
    assert(before(1L) != before(2L), "fixture broken: A and B must start separate")
    val inc = vecLabels(Similarity.embeddingClustersIncremental(emb))
    val full = vecLabels(Similarity.embeddingClusters(emb))
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc(1L) == 1L && inc(2L) == 1L && inc(5L) == 1L,
      s"bridge must weld {1,2,5} under min-id 1: $inc")
    assert(inc(3L) == 3L, "untouched singleton must keep its label")
    assert(inc(10L) == 10L && inc(15L) == 10L,
      s"batch-only pair must form a new cluster under min-id 10: $inc")
  }

  test("semantic: the store-backed registered form is row-identical to the inline merge") {
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(1f, 1f, 0f, 0f)),
      (10L, Seq(0f, 0f, 0f, 1f)), (15L, Seq(0f, 0f, 0.1f, 1f)))
      .toDF("vec_id", "embedding")
    def rows(df: DataFrame) = df.select("vec_id", "cluster_id", "is_canonical")
      .collect().map(_.toString).sorted.toSeq
    val stored = rows(graft.operators.PairIndexStore
      .embeddingClusterIncrementalStoreQ(emb))
    assert(stored == rows(Similarity.embeddingClustersIncremental(emb)))
    // second call reads the persisted labels back — still identical
    assert(stored == rows(graft.operators.PairIndexStore
      .embeddingClusterIncrementalStoreQ(emb)))
  }

  test("semantic: no batch rows — labels are exactly the corpus labels") {
    val emb = Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    assert(vecLabels(Similarity.embeddingClustersIncremental(emb)) ==
      vecLabels(Similarity.embeddingClusters(emb)))
  }
}
