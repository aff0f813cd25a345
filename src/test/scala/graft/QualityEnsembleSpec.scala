package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityEnsemble

/** Borda fusion: hand-ranked planted stratum, a full Scala recount on the
  * gate corpus, and the one-exchange stratified window stack.
  */
class QualityEnsembleSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: signal ranks, Borda sums and the keep gate") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "the the the"),      // s 1000/333/30 → ranks 1/3/3 → borda 7
      (2L, "en", "alpha beta gamma"), // s 0/1000/46   → ranks 3/1/1 → borda 5
      (3L, "en", "the beta beta"))    // s 333/666/36  → ranks 2/2/2 → borda 6
      .toDF("doc_id", "lang", "text")
    val out = QualityEnsemble.qualityEnsembleQ(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(out(1L) == ((1000L, 333L, 30L, 7L, 3L, false)))
    assert(out(2L) == ((0L, 1000L, 46L, 5L, 1L, true)))  // 100 <= 150
    assert(out(3L) == ((333L, 666L, 36L, 6L, 2L, false))) // 200 > 150
  }

  test("gate corpus: fusion recomputes from a plain Scala rank") {
    val stop = graft.operators.TextOps.Stopwords.toSet
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val sig = rs.map { case (id, _, t) =>
        val w = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        val n = w.length.toLong max 1L
        val alpha = t.replaceAll("\\s+", "").length.toLong
        (id, (w.count(stop).toLong * 1000 / n,
          w.distinct.length.toLong * 1000 / n, alpha * 10 / n))
      }
      def ranks(key: ((Long, (Long, Long, Long))) => Long): Map[Long, Long] =
        sig.sortBy(e => (-key(e), e._1)).zipWithIndex
          .map { case (e, i) => e._1 -> (i + 1L) }.toMap
      val (r1, r2, r3) = (ranks(_._2._1), ranks(_._2._2), ranks(_._2._3))
      val borda = sig.map(e => e._1 -> (r1(e._1) + r2(e._1) + r3(e._1))).toMap
      val nl = rs.length.toLong
      sig.sortBy(e => (borda(e._1), e._1)).zipWithIndex.map { case (e, i) =>
        e._1 -> ((borda(e._1), i + 1L, (i + 1L) * 100 <= nl * QualityEnsemble.KeepPct))
      }
    }.toMap
    val out = QualityEnsemble.qualityEnsembleQ(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(5), r.getLong(6), r.getBoolean(7))))
      .toMap
    assert(out == expected)
  }

  test("plan: all five windows share one lang exchange") {
    val plan = QualityEnsemble.qualityEnsemble(docs)
      .queryExecution.executedPlan.toString
    val langExchanges = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange hashpartitioning(lang"))
    assert(langExchanges == 1,
      s"expected 1 shared lang exchange, got $langExchanges:\n$plan")
  }
}
