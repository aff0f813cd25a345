package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TokenizeIds, Vocab}

/** Vocabulary application: exact id recomputation against vocab_build,
  * UNK semantics, stream-reconstruction totality, and the broadcast-only
  * plan (the token stream must never shuffle for id assignment).
  */
class TokenizeIdsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("every position maps to the vocab_build unigram id; OOV is exactly UNK") {
    val vocab = Vocab.vocabBuild(docs).collect()
      .filter(!_.getBoolean(2)).map(r => r.getString(1) -> r.getInt(0).toLong).toMap
    val rows = TokenizeIds.tokenizeIdsQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, pos, token, tokenId, isUnk) =>
      vocab.get(token) match {
        case Some(v) => assert(tokenId == v && !isUnk, s"doc $id pos $pos '$token'")
        case None    => assert(tokenId == -1L && isUnk, s"doc $id pos $pos '$token'")
      }
    }
    assert(rows.exists(_._5) || vocab.nonEmpty, "fixture should exercise UNK or vocab")
    // token stream reconstructs each doc's normalized split exactly
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val rebuilt = rs.sortBy(_._2).map(_._3).mkString(" ")
      assert(rebuilt == texts(id).trim.toLowerCase.replaceAll("\\s+", " "),
        s"doc $id stream")
      assert(rs.map(_._2).sorted.sameElements(rs.indices.map(_.toLong)),
        s"doc $id positions dense from 0")
    }
  }

  test("planted fixture: a df=1 token falls under min-df and maps to UNK") {
    import spark.implicits._
    val planted = Seq(
      (1L, "common words here plus a hapaxlegomenon"),
      (2L, "common words here again"),
      (3L, "common words here too")).toDF("doc_id", "text")
    val rows = TokenizeIds.tokenizeIds(planted).collect()
      .map(r => r.getString(2) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(rows("hapaxlegomenon") == ((-1L, true)), "df=1 token must be UNK")
    assert(rows("common")._1 >= 0L && !rows("common")._2, "df=3 token must be in-vocab")
  }

  test("plan: id assignment is one broadcast join — the token stream never shuffles") {
    val plan = TokenizeIds.tokenizeIds(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(6).mkString("\n"))
    // exchanges exist only below the broadcast (vocab build); the probe
    // side path scan→generate→join must be exchange-free
    val probeSide = plan.linesIterator.takeWhile(!_.contains("BroadcastExchange")).mkString("\n")
    assert(!probeSide.contains("Exchange"),
      s"token stream must not shuffle before the join:\n$probeSide")
  }
}
