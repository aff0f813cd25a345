package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbeddingProfile

/** Embedding profile: planted µ/milli quantization arithmetic (zero
  * vector, dim mismatch, negative components), a full Scala recount on
  * the gate table, and the zero-join map+agg plan.
  */
class EmbeddingProfileSpec extends AnyFunSuite {
  import SparkTestSession._

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("planted: quantization, zero-norm count and dim mismatch surface") {
    val out = EmbeddingProfile.embeddingProfileQ(emb(Seq(
      (1L, Seq(0.5f, -0.25f), 1),
      (2L, Seq(0f, 0f), 1),
      (3L, Seq(1f, 1f, 1f), 2)))).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))))
    assert(out.toSeq == Seq(
      (1, (2L, 2, 2, 1L, 0L, 312500000000L, 312500L, -250000L, 500000L)),
      (2, (1L, 3, 3, 0L, 3000000000000L, 3000000000000L, 3000000L, 1000000L, 1000000L))))
  }

  test("gate: full Scala recount of every label row") {
    val rows = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, rs) =>
      val qs = rs.map(_._2.map(x => math.round(x.toDouble * 1000000.0)))
      val ms = rs.map(_._2.map(x => math.round(x.toDouble * 1000.0)))
      val n2u = qs.map(_.map(q => q * q).sum)
      (l, rs.size.toLong, rs.map(_._2.size).min, rs.map(_._2.size).max,
        n2u.count(_ == 0L).toLong, n2u.min, n2u.max,
        ms.map(_.map(q => q * q).sum).sum,
        qs.map(_.min).min, qs.map(_.max).max)
    }
    val out = EmbeddingProfile.embeddingProfileQ(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9))).toSeq
    assert(out == expected)
  }

  test("plan: zero joins, zero windows — map pass + one combinable agg") {
    val plan = EmbeddingProfile.embeddingProfileQ(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }
}
