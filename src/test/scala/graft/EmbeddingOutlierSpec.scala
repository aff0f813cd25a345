package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbeddingOutlier

/** Semantic outlier scoring: planted off-cluster vector, partitioning
  * independence of the integer centroid, and a full Scala recount at gate
  * scale.
  */
class EmbeddingOutlierSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Half-away-from-zero scale-0 round — what both engines' round(x) does
    * (math.round is half-toward-+inf, which differs on negative halves). */
  private def roundAway(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  test("planted fixture: the flipped vector is the label's top outlier") {
    import spark.implicits._
    val tight = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 7),
      (2L, Seq(0.99f, 0.1f, 0.0f), 7),
      (3L, Seq(0.98f, -0.1f, 0.0f), 7),
      (4L, Seq(-1.0f, 0.0f, 0.0f), 7),   // flipped — far from the centroid
      (5L, Seq(0.0f, 1.0f, 0.0f), 8),    // second label: both rank, neither
      (6L, Seq(0.0f, 0.9f, 0.1f), 8))    // is meaningfully an outlier
      .toDF("vec_id", "embedding", "label")
    val rows = EmbeddingOutlier.embeddingOutliers(tight, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getBoolean(4))).toMap
    assert(rows(4L) == (1, true), "flipped vector ranks first in label 7")
    assert(!rows(1L)._2 && !rows(2L)._2 && !rows(3L)._2)
    // label-8 centroid is (0, 1.9, 0.1): vec 6 (0, .9, .1) sits slightly
    // farther (cos .99833) than vec 5 (0, 1, 0) (cos .99862)
    assert(rows(6L)._1 == 1 && rows(5L)._1 == 2, "label 8 ranks by cos asc")
  }

  test("integer centroid makes scores partitioning-independent") {
    val base = Tables.embeddings(spark, sf)
    val a = EmbeddingOutlier.embeddingOutliersQ(base).collect().toSeq
    val b = EmbeddingOutlier.embeddingOutliersQ(base.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("gate corpus: scores match an independent Scala integer recount") {
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => roundAway(x.toDouble * 1e6)).toArray))
    val cent = rows.groupBy(_._2).map { case (l, vs) =>
      l -> vs.map(_._3).transpose.map(_.sum) }
    val expected = rows.map { case (id, l, vi) =>
      val ci = cent(l)
      val dot = vi.zip(ci).map { case (a, b) => a * b }.sum
      val nv2 = vi.map(x => x * x).sum
      val nc2 = ci.map(x => x * x).sum
      val cos = dot.toDouble / (math.sqrt(nv2.toDouble) * math.sqrt(nc2.toDouble))
      (id, l) -> (roundAway(cos * 1e6) / 1e6)
    }.toMap
    val got = EmbeddingOutlier.embeddingOutliersQ(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(v == expected(k), s"vec $k") }
  }
}
