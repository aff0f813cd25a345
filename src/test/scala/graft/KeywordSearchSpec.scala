package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KeywordSearch

/** Keyword retrieval: planted corpus with hand-computed integer scores,
  * and a full independent Scala recount + re-rank over the gate corpus.
  */
class KeywordSearchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted fixture: integer tf-idf scores and ranks") {
    import spark.implicits._
    // query = (join, scan, spark, window); 4 docs, N=4
    // df: join 2, scan 1, spark 3 -> idf_w = 4e6 div df
    val docs = Seq(
      (1L, "spark join join alpha", "en", "s1"),       // tf: join 2, spark 1
      (2L, "spark beta", "en", "s1"),                  // tf: spark 1
      (3L, "scan spark join gamma", "en", "s2"),       // tf: scan 1, spark 1, join 1
      (4L, "no query terms here at all", "en", "s2")   // no hits
    ).toDF("doc_id", "text", "lang", "source")
    val wJoin = 4000000L / 2; val wScan = 4000000L / 1; val wSpark = 4000000L / 3
    val exp = Map(
      1L -> (2L, 2 * wJoin + wSpark),
      2L -> (1L, wSpark),
      3L -> (3L, wJoin + wScan + wSpark))
    val rows = KeywordSearch.keywordSearch(docs, k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.map(_._2).toSet == Set(1L, 2L, 3L), "doc 4 never ranks")
    rows.foreach { case (_, id, nTerms, scoreI, score) =>
      assert((nTerms, scoreI) == exp(id), s"doc $id")
      assert(score == math.round(scoreI.toDouble / 1e6 * 1e6) / 1e6)
    }
    // scan is the rarest term: doc 3 outranks doc 1 outranks doc 2
    assert(rows.sortBy(_._1).map(_._2).toSeq == Seq(3L, 1L, 2L))
  }

  test("gate corpus: top-K matches an independent Scala recount") {
    val metaRows = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source").collect()
    val meta = metaRows.map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    val toks = metaRows.map(r =>
      r.getLong(0) -> Option(r.getString(1)).map(_.trim.toLowerCase.split("\\s+").toSeq)
        .getOrElse(Seq.empty))
    val n = toks.size.toLong
    val q = KeywordSearch.QueryTerms.toSet
    val tf = toks.map { case (id, w) =>
      id -> w.filter(q).groupBy(identity).map { case (t, v) => t -> v.size.toLong } }
    val df = q.map(t => t -> tf.count(_._2.contains(t)).toLong).toMap
    val scored = tf.filter(_._2.nonEmpty).map { case (id, m) =>
      (id, m.size.toLong,
        m.map { case (t, c) => c * (n * KeywordSearch.IdfScale / df(t)) }.sum)
    }.sortBy { case (id, _, s) => (-s, id) }.take(KeywordSearch.TopK)
    val expected = scored.zipWithIndex.map { case ((id, nt, si), i) =>
      (i + 1, id, meta(id)._1, meta(id)._2, nt, si,
        math.round(si.toDouble / 1e6 * 1e6) / 1e6) }.toSeq
    val got = KeywordSearch.keywordSearchQ(Tables.documents(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expected)
  }
}
