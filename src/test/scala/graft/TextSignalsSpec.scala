package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Lexicon, Readability}

/** Lexicon gate + readability: planted polarity/grade cases (incl. the
  * signed-division truncation pin), full Scala recounts, zero-exchange
  * plans.
  */
class TextSignalsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(l => l.startsWith("Exchange") || l.startsWith("BroadcastExchange"))

  test("lexicon: planted polarity incl. negative truncation; flag fires") {
    import spark.implicits._
    val df = Seq(
      (1L, "fast clean simple code ships good results"),            // all positive
      (2L, "slow broken fragile mess with wrong results every day"), // negative-dominated
      (3L, "fast but slow"),                                        // net zero
      // 1 neg in 7 tokens: (0-1)*1000/7 = -142.857 → TRUNCATES to -142
      // (a floor would give -143 — the engine-divergence pin)
      (4L, "slow word word word word word word"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Lexicon.lexiconScoreQ(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(out(1L)._2 > 0 && out(1L)._3 == 0 && out(1L)._4 > 0 && !out(1L)._5)
    assert(out(2L)._5, "negative-dominated doc not flagged")
    assert(out(3L)._4 == 0L && !out(3L)._5)
    assert(out(4L) == ((7L, 0L, 1L, -142L, true)),
      s"signed division must truncate, got ${out(4L)}")
    assert(out(5L) == ((0L, 0L, 0L, 0L, false)), "NULL text not total")
  }

  test("lexicon: gate corpus recount; the fast/slow pair makes the signal live") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val out = Lexicon.lexiconScoreQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    texts.foreach { case (id, t) =>
      val w = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val np = w.count(Lexicon.Positive.contains)
      val nn = w.count(Lexicon.Negative.contains)
      val num = (np - nn) * 1000L
      val pm = if (w.isEmpty) 0L
        else (if (num < 0) -1L else 1L) * (math.abs(num) / w.length)
      assert(out(id) == ((w.length.toLong, np.toLong, nn.toLong, pm)), s"doc $id")
    }
    assert(out.values.exists(_._4 > 0) && out.values.exists(_._4 < 0),
      "corpus polarity is one-sided — signal inert")
  }

  test("readability: planted grades and conventions; corpus recount") {
    import spark.implicits._
    val df = Seq(
      // 2 sentences, 8 words, monosyllables → grade 0.39*4 + 11.8*1 - 15.59
      (1L, "the cat sat on mats. the dog ran!"),
      (2L, "extraordinarily sophisticated multisyllabic terminology"),
      (3L, "no punctuation here at all"),
      (4L, "rhythm tsk pfft"),   // zero-vowel words → 1-syllable floor
      (5L, ""), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Readability.readabilityQ(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    val g1 = 0.39 * 4.0 + 11.8 * 1.0 - 15.59
    assert(out(1L)._1 == 2L && out(1L)._2 == 8L && out(1L)._3 == 8L)
    assert(math.abs(out(1L)._4.get - math.round(g1 * 10000.0) / 10000.0) < 1e-9)
    assert(out(2L)._1 == 1L && out(2L)._3 > 12L, "polysyllabic words undercounted")
    assert(out(2L)._4.get > out(1L)._4.get, "complex text must grade higher")
    assert(out(3L)._1 == 1L, "no-punctuation doc is one sentence")
    assert(out(4L)._3 == 3L, "syllable floor of 1 per word")
    assert(out(5L) == ((0L, 0L, 0L, None)) && out(6L) == ((0L, 0L, 0L, None)))

    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val full = Readability.readabilityQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    texts.foreach { case (id, t) =>
      val w = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val sg = t.trim.toLowerCase.split("[.!?]+").count(_.trim.nonEmpty)
      val sent = math.max(sg, if (w.nonEmpty) 1 else 0)
      val syl = w.map(tk => math.max("[aeiouy]+".r.findAllIn(tk).size, 1).toLong).sum
      assert(full(id) == ((sent.toLong, w.length.toLong, syl)), s"doc $id")
    }
  }

  test("plans: both signals are zero-exchange map passes") {
    assert(exchanges(Lexicon.lexiconScore(docs)) == 0, "lexicon plan shuffles")
    assert(exchanges(Readability.readability(docs)) == 0, "readability plan shuffles")
  }
}
