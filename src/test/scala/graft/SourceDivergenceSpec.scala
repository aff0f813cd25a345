package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SourceDivergence

/** Per-source TV divergence: hand-computed planted distances, empty-source
  * totality, a full Scala recount on the gate corpus, and the shared
  * window+agg exchange.
  */
class SourceDivergenceSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: exact ppm TV distances and top divergent terms") {
    import spark.implicits._
    // global: x2 y2 z1, N=5 → ppm_g x 400000, y 400000, z 200000
    val df = Seq(
      (1L, "A", "x x y"),   // n=3: x 666666 y 333333 → gaps 266666, 66667, z 200000 → tv 266666
      (2L, "B", "y z"))     // n=2: y 500000 z 500000 → gaps x 400000, 100000, 300000 → tv 400000
      .toDF("doc_id", "source", "text")
    val out = SourceDivergence.sourceDivergence(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))).toMap
    assert(out("A") == ((3L, 2L, 266666L, "x", 266666L)))
    assert(out("B") == ((2L, 2L, 400000L, "x", 400000L)))
  }

  test("zero-token source stays total: TV ~ half the corpus mass") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", "x x y"), (2L, "B", "y z"),
      (3L, "C", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val out = SourceDivergence.sourceDivergence(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))).toMap
    // C has no tokens: every gap = ppm_g → tv = (400000+400000+200000) div 2;
    // top tie 400000 between x and y → term asc → x
    assert(out("C") == ((0L, 0L, 500000L, "x", 400000L)))
    assert(out.size == 3)
  }

  test("gate corpus: every source recomputes from a plain Scala count") {
    val rows = docs.select("source", "text").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
    def toks(t: String): Seq[String] =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val global = rows.flatMap(r => toks(r._2)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val nTot = global.values.sum max 1L
    val expected = rows.groupBy(_._1).map { case (src, rs) =>
      val cs = rs.flatMap(r => toks(r._2)).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
      val nS = cs.values.sum max 1L
      val gaps = global.keySet.toSeq.map { t =>
        val ppmS = cs.getOrElse(t, 0L) * 1000000L / nS
        val ppmG = global(t) * 1000000L / nTot
        (t, math.abs(ppmS - ppmG))
      }
      val top = gaps.minBy { case (t, g) => (-g, t) }
      src -> ((cs.values.sum, cs.size.toLong, gaps.map(_._2).sum / 2,
        top._1, top._2))
    }
    val out = SourceDivergence.sourceDivergenceQ(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))).toMap
    assert(out == expected)
  }

  test("plan: final agg consumes the rank window directly (shared exchange)") {
    val plan = SourceDivergence.sourceDivergence(docs)
      .queryExecution.executedPlan.toString
    val ls = plan.linesIterator.toVector
    val wi = ls.indexWhere(_.contains("Window [row_number()"))
    assert(wi > 0, s"no rank window in plan:\n$plan")
    // the partial aggregate sits immediately above the window — the
    // source-keyed exchange below the window is the ONLY one they ride
    assert(ls(wi - 1).contains("Aggregate"),
      s"expected agg directly above window, saw: ${ls(wi - 1)}\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
