package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SemanticKeepBest, Similarity}

/** SemDeDup canonical choice: label agreement with embedding_cluster,
  * exactly-one-kept per cluster, centroid-max invariant, planted
  * non-min-id winner, singleton convention.
  */
class SemanticKeepBestSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("gate corpus: labels match embedding_cluster; one kept per cluster; kept = max rounded cosine") {
    val out = SemanticKeepBest.semanticKeepBestQ(emb).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3), r.getBoolean(4)))
      .toMap
    val labels = Similarity.embeddingClusters(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == labels.keySet)
    out.foreach { case (id, (cl, _, _, _)) =>
      assert(cl == labels(id), s"vec $id cluster $cl != ${labels(id)}")
    }
    val byCluster = out.groupBy(_._2._1)
    byCluster.foreach { case (cl, ms) =>
      val kept = ms.filter(_._2._4)
      assert(kept.size == 1, s"cluster $cl keeps ${kept.size} members")
      val (keptId, (_, keptCos, keptRank, _)) = kept.head
      assert(keptRank == 1)
      // rounded-key max: no member may exceed the kept cosine by ≥ 1e-6;
      // ties break to the smaller vec_id
      ms.foreach { case (id, (_, cos, _, _)) =>
        val kk = math.round(keptCos * 1e6); val mk = math.round(cos * 1e6)
        assert(mk <= kk, s"cluster $cl member $id outscores kept")
        if (mk == kk) assert(keptId <= id, s"cluster $cl tie not broken by id")
      }
    }
    // singletons keep themselves at cosine 1
    byCluster.filter(_._2.size == 1).take(5).foreach { case (_, ms) =>
      val (_, (_, cos, _, kept)) = ms.head
      assert(kept && math.abs(cos - 1.0) < 1e-6)
    }
    assert(byCluster.exists(_._2.size > 1), "no non-trivial cluster at gate scale")
  }

  test("planted: the centroid-closest member wins even when it is not the min id") {
    import spark.implicits._
    // three near-identical vectors; vec 3 sits between 1 and 2 → closest
    // to the centroid; min-id canonical would pick 1
    val v1 = Array(1.0f, 0.0f, 0.02f, 0f)
    val v2 = Array(1.0f, 0.02f, 0.0f, 0f)
    val v3 = Array(1.0f, 0.01f, 0.01f, 0f)
    val far = Array(0f, 0f, 0f, 1.0f)
    val df = Seq((1L, v1, "a"), (2L, v2, "a"), (3L, v3, "a"), (9L, far, "b"))
      .toDF("vec_id", "embedding", "label")
    val out = SemanticKeepBest.semanticKeepBestQ(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L,
      "near-identical trio must form one cluster with min-id label 1")
    assert(out(3L)._2, "centroid-closest member (vec 3) must be kept")
    assert(!out(1L)._2 && !out(2L)._2, "min-id member must NOT be kept here")
    assert(out(9L)._2 && out(9L)._1 == 9L, "singleton keeps itself")
  }
}
