package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbeddingQuantize

/** Int8 PTQ audit: hand-computed planted arithmetic (incl. the zero
  * vector and exact-scale components), a full Scala recount on the
  * gate table, and the half-step error bound as an invariant.
  */
class EmbeddingQuantizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("planted: round-trip error from hand arithmetic; zero vector exact") {
    // [1.0, -0.5, 0.0]: s=1e6; a=1e6 → m=127 → d=1e6 → err 0;
    // a=5e5 → m=64 → d=503937 → err 3937; a=0 → 0
    val out = EmbeddingQuantize.embeddingQuantizeAuditQ(emb(Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f), 1),
      (2L, Seq(0.0f, 0.0f), 2)))).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, 1L, 3937L, 1312L, 1000000L),  // mean = 3937 div 3
      (2, 1L, 0L, 0L, 1L)))
  }

  test("gate: full Scala recount of every label + half-step error bound") {
    val rows = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1)))
    def err(q: Long, s: Long): Long = {
      val a = math.abs(q)
      val m = (a * 254 + s) / (2 * s)
      val d = (m * 2 * s + 127) / 254
      math.abs(a - d)
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, rs) =>
      val qs = rs.map(_._2.map(x => math.round(x.toDouble * 1000000.0)))
      val ss = qs.map(q => math.max(math.max(q.max, -q.min), 1L))
      val errs = qs.zip(ss).map { case (q, s) => q.map(e => err(e, s)) }
      val nComps = qs.map(_.size.toLong).sum
      (l, rs.size.toLong, errs.map(_.max).max,
        errs.map(_.sum).sum / math.max(nComps, 1L), ss.max)
    }
    val out = EmbeddingQuantize.embeddingQuantizeAuditQ(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == expected)
    // PTQ soundness: worst error never exceeds half an int8 step (+1 floor slack)
    out.foreach { r => assert(r._3 <= r._5 / 254 + 1, s"bound violated: $r") }
  }

  test("plan: zero joins, zero windows — map pass + one combinable agg") {
    val plan = EmbeddingQuantize.embeddingQuantizeAuditQ(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }
}
