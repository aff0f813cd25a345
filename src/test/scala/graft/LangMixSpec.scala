package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LangMix, TextOps}

/** Window-granularity language composition: planted mixed/pure/degenerate
  * docs, and a full independent Scala recount of the classifier rollup
  * over the gate corpus.
  */
class LangMixSpec extends AnyFunSuite {
  import SparkTestSession._

  // one 8-token window each, unambiguous under the marker classifier
  private val EnW = "the cat of all and dog is here"
  private val DeW = "der hund und die nicht katze da war"
  private val ZzW = "z1 z2 z3 z4 z5 z6 z7 z8"

  test("planted fixture: pure, mixed, unknown-only, NULL text") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$EnW $EnW $EnW $EnW"),  // pure en
      (2L, s"$EnW $DeW $EnW $DeW"),  // 50/50 en-de → mixed, tie → en
      (3L, null),                    // NULL → none / 0.0 / not mixed
      (4L, ZzW),                     // single unknown window
      (5L, s"$EnW $EnW $EnW $EnW $DeW") // 80% en → NOT mixed (>= boundary)
    ).toDF("doc_id", "text")
    val out = LangMix.langMixQ(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(7), r.getDouble(8), r.getBoolean(9)))
      .toMap
    assert(out(1L) == ((4L, 4L, 0L, "en", 1.0, false)))
    assert(out(2L) == ((4L, 2L, 2L, "en", 0.5, true)), "tie breaks to en; 0.5 < 0.8 → mixed")
    assert(out(3L) == ((0L, 0L, 0L, "none", 0.0, false)))
    assert(out(4L)._4 == "unknown" && !out(4L)._6)
    assert(out(5L) == ((5L, 4L, 1L, "en", 0.8, false)), "0.8 is not < 0.8 → pure")
  }

  test("gate corpus: rollup matches an independent Scala recount") {
    val langs = TextOps.LangMarkers.map(_._1) :+ "unknown"
    val markers = TextOps.LangMarkers.toMap
    def classify(window: String): String = {
      val padded = " " + window + " "
      val scores = TextOps.LangMarkers.map { case (l, ms) =>
        l -> ms.count(padded.contains)
      }.toMap
      TextOps.LangMarkers.map(_._1)
        .find(l => scores(l) > 0 && TextOps.LangMarkers.forall { case (o, _) => scores(l) >= scores(o) })
        .getOrElse("unknown")
    }
    val expected = Tables.documents(spark, sf).select("doc_id", "text").collect().map { r =>
      val id = r.getLong(0)
      val windows = Option(r.getString(1))
        .map(_.trim.toLowerCase.split("\\s+").toSeq).getOrElse(Seq.empty)
        .grouped(graft.operators.ParagraphDedup.ParaWindowTokens).map(_.mkString(" ")).toSeq
      val counts = langs.map(l => windows.count(w => classify(w) == l))
      id -> (windows.size.toLong, counts.map(_.toLong))
    }.toMap
    val got = LangMix.langMix(Tables.documents(spark, sf)).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), langs.indices.map(i => r.getLong(2 + i)).toSeq)
    }.toMap
    assert(got == expected)
  }
}
