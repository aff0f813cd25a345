package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HardNegative, Similarity}

class HardNegativeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("planted: returns the highest-cosine CROSS-label neighbors, in order") {
    // query (id 100, label 0) at e1; same-label near-twin at e1 (excluded),
    // cross-label vectors at angles giving cos 0.8, 0.6, 0.0 — expect the
    // 0.8 then 0.6 then 0.0 ones, ranks 1..3
    val vecs = Seq(
      (100L, Array(1f, 0f), 0),          // the query (100 % QueryMod == 0)
      (1L, Array(1f, 0.01f), 0),         // same label: never a negative
      (2L, Array(0.8f, 0.6f), 1),        // cos 0.8
      (3L, Array(0.6f, 0.8f), 1),        // cos 0.6
      (4L, Array(0f, 1f), 2))            // cos 0.0
      .toDF("vec_id", "embedding", "label")
    val got = HardNegative.hardNegatives(vecs).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (100L, 0, 2L, 1, 1), (100L, 0, 3L, 1, 2), (100L, 0, 4L, 2, 3)))
  }

  test("gate corpus: negatives are cross-label, cos-ordered, k-bounded") {
    val rows = HardNegative.hardNegatives(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) != r.getInt(3), s"same-label row: $r"))
    rows.groupBy(_.getLong(0)).foreach { case (qid, g) =>
      assert(g.length <= HardNegative.K)
      val byRank = g.sortBy(_.getInt(4))
      assert(byRank.map(_.getInt(4)).toSeq == (1 to g.length), s"rank holes for $qid")
      // cos non-increasing with rank
      byRank.map(_.getDouble(5)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"cos not sorted for $qid")
        case _ => ()
      }
    }
  }

  test("gate corpus: rank-1 negative cosine never exceeds knn rank-1 cosine") {
    // the unconstrained nearest neighbor is at least as close as the
    // nearest cross-label one — ties allowed (when knn's top-1 happens to
    // be cross-label they are the same row)
    val knn1 = Similarity.knnCosineBrute(emb).filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("knn_cos"))
    val hn1 = HardNegative.hardNegatives(emb).filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("hn_cos"))
    val joined = knn1.join(hn1, Seq("query_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getDouble(1) >= r.getDouble(2) - 1e-12))
  }

  test("plan: broadcast query side, single corpus scan") {
    val plan = HardNegative.hardNegatives(emb).queryExecution.executedPlan.toString
    // label-inequality join ⇒ broadcast nested loop over the tiny query
    // side — the documented broadcast-fact class (knn_brute precedent)
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
