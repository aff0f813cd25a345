package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupDegree, Lsh}

/** Duplication topology: histogram recounts from the shipped pair set,
  * degree-0 totality, and mass conservation.
  */
class DedupDegreeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("gate corpus: histogram recomputes from the verified pair set") {
    val pairs = Lsh.minhashLshQ(docs).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val hist = ids.map(id => deg.getOrElse(id, 0L))
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val total = ids.length.toLong
    val expected = hist.map { case (d, n) => d -> ((n, n * 1000000L / total)) }
    val out = DedupDegree.dedupDegreeQ(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == expected)
    assert(out.contains(0L), "gate corpus has isolated docs")
    assert(out.values.map(_._1).sum == total, "every doc appears exactly once")
  }

  test("planted: a duplicate star yields the expected degrees") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, base), (2L, base), (3L, base),     // 3-clique: degree 2 each
      (4L, "totally different words here now")) // isolated
      .toDF("doc_id", "text")
    val out = DedupDegree.dedupDegreeQ(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 2L -> 3L))
  }
}
