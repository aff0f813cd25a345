package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Conformance, EmbeddingDrift, TopicClassify, TopicTerms}

/** cTF-IDF topic terms, process conformance, embedding drift: gate-corpus
  * recounts + planted verdict algebra.
  */
class TopicTermsConformanceDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gate corpus: topic_terms recount from the labeler") {
    val docs = Tables.documents(spark, sf)
    val labels = TopicClassify.topicClassify(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = docs.select("doc_id", "text").collect()
      .flatMap(r => Option(r.getString(1)).toSeq.flatMap(t =>
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(w => (labels(r.getLong(0)), w))))
    val counts = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val termTot = toks.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val topicTot = toks.groupBy(_._1).map { case (t, v) => t -> v.size.toLong }
    val n = toks.size.toLong
    val expected = counts.toSeq
      .filter(_._2 >= TopicTerms.MinTermCount)
      .map { case ((topic, term), ctt) =>
        (topic, term, ctt, termTot(term), topicTot(topic),
          ctt.toDouble * n / (topicTot(topic) * termTot(term)))
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._6, t._2)).take(TopicTerms.TopK).zipWithIndex
          .map { case ((topic, term, ctt, ct, nt, lift), i) =>
            (topic, i + 1, term, ctt, ct, nt, math.round(lift * 1e4) / 1e4) }
      }.sortBy(t => (t._1, t._2))
    val got = TopicTerms.topicTermsQ(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expected)
  }

  test("planted conformance: _start entry, allowed vs violation verdicts") {
    import spark.implicits._
    val rows = Seq(
      // u1: view -> click -> purchase (all allowed incl _start->view)
      (1L, new Timestamp(1000L), 1L, "view", 1.0),
      (2L, new Timestamp(2000L), 1L, "click", 1.0),
      (3L, new Timestamp(3000L), 1L, "purchase", 1.0),
      // u2: starts with purchase (violation: _start->purchase),
      // then purchase->purchase (violation)
      (4L, new Timestamp(1000L), 2L, "purchase", 1.0),
      (5L, new Timestamp(2000L), 2L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Conformance.transitionConformanceQ(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("_start", "view")) == ((1L, 1L, true)))
    assert(out(("view", "click")) == ((1L, 1L, true)))
    assert(out(("click", "purchase")) == ((1L, 1L, true)))
    assert(out(("_start", "purchase")) == ((1L, 1L, false)))
    assert(out(("purchase", "purchase")) == ((1L, 1L, false)))
    assert(out.size == 5)
  }

  test("gate corpus: conformance recount") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS t_us", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._4)
      ("_start" +: sorted).zip(sorted).map { case (f, t) => (f, t, u) }
    }
    val allowed = Conformance.AllowedTransitions.toSet
    val expected = trans.groupBy(t => (t._1, t._2)).toSeq.map { case ((f, t), v) =>
      (f, t, v.size.toLong, v.map(_._3).distinct.size.toLong, allowed((f, t)))
    }.sortBy(t => (t._1, t._2))
    val got = Conformance.transitionConformanceQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
  }

  test("gate corpus: embedding drift recount") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS vi")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
    def centroid(parity: Int) = vecs.filter(_._1 % 2 == parity).groupBy(_._2)
      .map { case (l, vs) =>
        l -> ((vs.map(_._3.toSeq).toSeq.transpose.map(_.sum), vs.size.toLong))
      }
    val o = centroid(0)
    val nw = centroid(1)
    val expected = (o.keySet ++ nw.keySet).toSeq.sorted.map { l =>
      val cos = (o.get(l), nw.get(l)) match {
        case (Some((a, _)), Some((b, _))) =>
          val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
          val v = dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
            math.sqrt(b.map(x => x * x).sum.toDouble))
          Some(math.round(v * 1e6) / 1e6)
        case _ => None
      }
      (l, o.get(l).map(_._2).getOrElse(0L), nw.get(l).map(_._2).getOrElse(0L), cos)
    }
    val got = EmbeddingDrift.embeddingDriftQ(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == expected)
  }
}
