package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupDegree, Lsh, SourceDupRate}

/** Source dup rate: full recount from the shipping pair miner + doc
  * spine, and the dup-mass identity with dedup_degree (one pair
  * stream, two reports).
  */
class SourceDupRateSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gate: recount from the pair stream; dup mass equals dedup_degree's") {
    val d = Tables.documents(spark, sf)
    val srcOf = d.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Lsh.minhashLshPairs(d).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val touched = pairs.flatMap { case (a, b) =>
      val w = srcOf(a) == srcOf(b)
      Seq((a, srcOf(a), w), (b, srcOf(b), w))
    }.distinct
    val perSource = touched.groupBy(_._2).map { case (s, ts) =>
      s -> ((ts.map(_._1).distinct.length.toLong,
        ts.filter(_._3).map(_._1).distinct.length.toLong,
        ts.filterNot(_._3).map(_._1).distinct.length.toLong))
    }
    val nDocs = srcOf.values.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val expected = nDocs.toSeq.sortBy(_._1).map { case (s, n) =>
      val (dd, w, c) = perSource.getOrElse(s, (0L, 0L, 0L))
      (s, n, dd, w, c, dd * 1000000L / math.max(n, 1L))
    }
    val out = SourceDupRate.sourceDupRateQ(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == expected)
    // cross-operator identity: total dup docs = dedup_degree's degree>0 mass
    val degMass = DedupDegree.dedupDegreeQ(d).collect()
      .filter(_.getLong(0) > 0).map(_.getLong(1)).sum
    assert(out.map(_._3).sum == degMass)
    assert(out.map(_._3).sum > 0) // live signal at gate
  }
}
