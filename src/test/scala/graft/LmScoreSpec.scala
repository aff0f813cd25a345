package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmScore

/** Bigram-LM likelihood scoring: independent Scala recount of the whole
  * model (counts, smoothing, floor division) on the gate corpus, the
  * planted separating-power case (attested text ≫ vocabulary salad), and
  * degenerate totality.
  */
class LmScoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  /** Reference implementation: train on one text set, score another. */
  private def scoreWith(train: Map[Long, String],
                        score: Map[Long, String]): Map[Long, (Long, Long)] = {
    // exact mirror of the operator: NULL → [], otherwise Java split (an
    // empty text yields one empty-string token, which enters V)
    def toks(t: String): Array[String] =
      Option(t).map(_.trim.toLowerCase.split("\\s+")).getOrElse(Array.empty)
    val trainTok = train.map { case (id, t) => id -> toks(t) }
    val pairs = trainTok.values.flatMap(w => w.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1)))).toSeq
    val bc = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cx = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = trainTok.values.flatten.toSet.size.toLong
    score.map { case (id, t) =>
      val w = toks(t)
      val ps = w.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
      val sum = ps.map { p =>
        ((bc.getOrElse(p, 0L) + 1L) * LmScore.Scale) / (cx.getOrElse(p._1, 0L) + v)
      }.sum
      id -> (ps.size.toLong, sum)
    }
  }

  private def scoreAll(texts: Map[Long, String]): Map[Long, (Long, Long)] =
    scoreWith(texts, texts)

  test("gate corpus: every count and floor-divided weight recomputes exactly") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = scoreAll(texts)
    val out = LmScore.lmScoreQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == texts.keySet)
    expected.foreach { case (id, (n, sum)) =>
      val (gn, gsum, gppm) = out(id)
      assert(gn == n, s"doc $id n_bigrams $gn != $n")
      assert(gsum == sum, s"doc $id sum_w $gsum != $sum")
      val want = math.round(sum.toDouble / math.max(n, 1) * 10000.0) / 10000.0
      assert(math.abs(gppm - want) < 1e-9, s"doc $id ppm $gppm != $want")
    }
  }

  test("separating power: attested ≫ salad; dup pair outscores a same-shaped unique doc") {
    import spark.implicits._
    // 6 docs of attested phrasing (shared bigrams), 1 shuffled salad over
    // the same vocabulary (every bigram unseen), 2 exact duplicates, and
    // 1 wholly unique doc (every bigram hapax) as the dup comparison
    val attested = (1 to 6).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog near trail $i"))
    val salad = (7L, "dog the near jumps lazy quick trail over fox brown the")
    val dups = Seq((8L, "copy of this exact duplicated text body"),
      (9L, "copy of this exact duplicated text body"))
    val unique = (10L, "another wholly unique sentence nobody else typed today")
    val df = (attested :+ salad).++(dups).:+(unique).toDF("doc_id", "text")
    val out = LmScore.lmScoreQ(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val attestedMin = (1 to 6).map(i => out(i.toLong)).min
    assert(attestedMin > out(7L) * 2,
      s"attested $attestedMin not ≫ salad ${out(7L)}")
    assert(out(8L) == out(9L), "exact dups must score identically")
    assert(out(8L) > out(10L),
      s"dup pair ${out(8L)} must outscore hapax-only doc ${out(10L)}")
  }

  test("incremental: model from the corpus partition only; batch docs never self-score") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mod = graft.operators.Dedup.IncrementalBatchMod
    val expected = scoreWith(
      texts.filter(_._1 % mod != 0), texts.filter(_._1 % mod == 0))
    val out = LmScore.lmScoreIncrementalQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == expected.keySet, "scored set != batch partition")
    expected.foreach { case (id, want) =>
      assert(out(id) == want, s"doc $id: ${out(id)} != $want")
    }
    // the scores genuinely differ from the self-trained form for some doc
    // (the batch's own mass is absent from the model)
    val full = LmScore.lmScoreQ(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(expected.keys.exists(id => full(id) != out(id)._2),
      "incremental scores identical to self-trained — model restriction inert")
  }

  test("degenerate docs: empty, one-token, NULL text → 0/0/0.0") {
    import spark.implicits._
    val df = Seq((1L, Some("solo")), (2L, Some("")), (3L, None: Option[String]),
      (4L, Some("two tokens")))
      .toDF("doc_id", "text")
    val out = LmScore.lmScoreQ(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id) == ((0L, 0L, 0.0)), s"doc $id not degenerate-zero")
    }
    assert(out(4L)._1 == 1L)
  }
}
