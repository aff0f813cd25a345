package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanQuality

/** Span quality: full Scala recount of every worst window on the gate
  * corpus (model + window algebra), boundary-pair exclusion, and
  * degenerate-doc totality.
  */
class SpanQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private def toks(t: String): Array[String] =
    Option(t).getOrElse("").toLowerCase.trim.split("\\s+")

  /** Plain-Scala reference: (doc -> (n_windows, worst_win, n_bigrams, avg)). */
  private def reference(rows: Array[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] = {
    val W = SpanQuality.WindowTokens
    val all = rows.map { case (id, t) => id -> toks(t) }
    val pairs = all.flatMap { case (_, w) => w.zip(w.drop(1)) }
    val cxy = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cx = cxy.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val v = all.flatMap(_._2).distinct.length.toLong
    all.map { case (id, w) =>
      val wins = w.zip(w.drop(1)).zipWithIndex
        .filter { case (_, i) => i % W != W - 1 }
        .groupBy(_._2 / W)
      if (wins.isEmpty) id -> ((0L, -1L, 0L, 0L))
      else {
        val scored = wins.toSeq.map { case (win, ps) =>
          val s = ps.map { case (p, _) =>
            (cxy.getOrElse(p, 0L) + 1L) * 1000000L / (cx.getOrElse(p._1, 0L) + v)
          }.sum
          (win.toLong, ps.length.toLong, s / ps.length)
        }
        val worst = scored.minBy { case (win, _, avg) => (avg, win) }
        id -> ((wins.size.toLong, worst._1, worst._2, worst._3))
      }
    }.toMap
  }

  test("gate corpus: every worst window recomputes from a plain Scala model") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = reference(rows)
    val out = SpanQuality.spanQualityQ(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out == expected)
  }

  test("planted: boundary pair belongs to neither window; short docs total") {
    import spark.implicits._
    val W = SpanQuality.WindowTokens
    // doc 1: W+1 distinct tokens → W pairs, pos W-1 excluded, window 1
    // has no internal pair → n_windows = 1, worst = window 0 with W-1 pairs
    val t1 = (0 to W).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, t1), (2L, "solo"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = SpanQuality.spanQualityQ(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((1L, 0L, W - 1L)))
    assert(out(2L) == ((0L, -1L, 0L)))
    assert(out(3L) == ((0L, -1L, 0L)))
  }
}
