package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupWeights}

/** Soft-dedup weights: cross-derivation against dedup_cluster (the weight
  * frame must be exactly the cluster frame + 1/size), and mass-conservation
  * (each cluster's summed ppm weight ≈ one document).
  */
class DedupWeightsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("gate corpus: weights are exactly 10^6 div cluster size, per member") {
    val clusters = Dedup.dedupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = clusters.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val got = DedupWeights.dedupWeightsQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == clusters.keys.toSeq.sorted, "one row per doc")
    got.foreach { case (doc, cl, sz, w) =>
      assert(cl == clusters(doc), s"cluster label drift at $doc")
      assert(sz == sizes(cl), s"size at $doc")
      assert(w == 1000000L / sz, s"weight at $doc")
    }
  }

  test("gate corpus: per-cluster mass is one doc minus only truncation loss") {
    val got = DedupWeights.dedupWeightsQ(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    got.groupBy(_._1).foreach { case (cl, rows) =>
      val mass = rows.map(_._3).sum
      val s = rows.head._2
      // s * (10^6 div s) differs from 10^6 only by the division remainder
      assert(mass == s * (1000000L / s) && 1000000L - mass < s,
        s"cluster $cl mass $mass size $s")
    }
  }
}
