package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TokenizeIds, TokenizerFertility}

/** Tokenizer fertility: planted UNK/char arithmetic under an explicit
  * vocab, cross-derivation from the shipped tokenize_ids stream on the
  * gate corpus, and the vocab-broadcast plan shape.
  */
class TokenizerFertilitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: explicit vocab pins UNK rate and fertility") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb cc", "s1"),   // aa,bb in vocab; cc UNK → 3 tok, 1 unk, 6 chars
      (2L, "aa", "s1"),         // 1 tok, 0 unk, 2 chars
      (3L, "dd", "s2"))         // 1 tok, 1 unk, 2 chars
      .toDF("doc_id", "text", "source")
    val vocab = Seq(("aa", 1L, false), ("bb", 2L, false), ("zz xx", 9L, true))
      .toDF("term", "vocab_id", "is_bigram")
    val out = TokenizerFertility.tokenizerFertility(docs, Some(vocab))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("s1", 2L, 4L, 1L, 250000L, 8L, 2000L),
      ("s2", 1L, 1L, 1L, 1000000L, 2L, 2000L)))
  }

  test("gate: cross-derives from the shipped tokenize_ids stream") {
    val docs = Tables.documents(spark, sf)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stream = TokenizeIds.tokenizeIds(docs)
      .selectExpr("doc_id", "token", "is_unk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val expected = stream.groupBy(t => srcOf(t._1)).toSeq.sortBy(_._1)
      .map { case (src, ts) =>
        val nTok = ts.length.toLong
        val nUnk = ts.count(_._3).toLong
        val nCh = ts.map(_._2.length.toLong).sum
        (src, ts.map(_._1).distinct.length.toLong, nTok, nUnk,
          nUnk * 1000000L / nTok, nCh, nCh * 1000L / nTok)
      }
    val out = TokenizerFertility.tokenizerFertilityQ(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(out == expected)
  }

  test("plan: the vocab lookup stays a broadcast; no corpus-sized build side") {
    val plan = TokenizerFertility.tokenizerFertilityQ(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1000))
  }
}
