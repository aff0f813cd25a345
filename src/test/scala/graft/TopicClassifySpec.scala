package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopicClassify

/** Lexicon topic labeling: planted winners incl. the score tie and the
  * unknown class, a full Scala recount on the gate corpus, and the
  * broadcast-lexicon plan shape.
  */
class TopicClassifySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: weighted winners, deterministic tie, unknown class") {
    import spark.implicits._
    val df = Seq(
      (1L, "join hash scan"),          // execution 4 (2 hits) beats storage 2
      (2L, "scan table stream window"),// storage 4 == streaming 4 → topic asc
      (3L, "zzz qqq"),                 // no hits
      (4L, null.asInstanceOf[String])) // no tokens
      .toDF("doc_id", "text")
    val out = TopicClassify.topicClassifyQ(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("execution", 4L, 2L)))
    assert(out(2L) == (("storage", 4L, 2L)))
    assert(out(3L) == (("unknown", 0L, 0L)))
    assert(out(4L) == (("unknown", 0L, 0L)))
  }

  test("gate corpus: every label recomputes from a plain Scala count") {
    val lex = TopicClassify.Lexicon
      .groupBy(_._2).view.mapValues(_.map(e => (e._1, e._3))).toMap
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val toks = Option(r.getString(1)).getOrElse("")
        .toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val perTopic = toks.flatMap(t => lex.getOrElse(t, Seq.empty))
        .groupBy(_._1).map { case (t, ws) =>
          (t, ws.map(_._2).sum, ws.length.toLong)
        }
      val (topic, score, hits) =
        if (perTopic.isEmpty) ("unknown", 0L, 0L)
        else perTopic.toSeq.minBy { case (t, s, _) => (-s, t) }
      r.getLong(0) -> ((topic, score, hits))
    }.toMap
    val out = TopicClassify.topicClassifyQ(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == expected)
  }

  test("plan: lexicon joins broadcast, token stream never shuffles into it") {
    val plan = TopicClassify.topicClassifyQ(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(plan.contains("Generate explode"), plan.take(800))
  }
}
