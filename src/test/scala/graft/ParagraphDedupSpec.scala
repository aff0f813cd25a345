package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ParagraphDedup

/** Sub-document (fixed-token-window) dedup: planted-window semantics, an
  * independent Scala recount over the gate corpus, and the load-bearing
  * plan shape (inline generator, materialized fp index, fp-keyed hash
  * join).
  */
class ParagraphDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  /** 8-token windows as strings, the same tokenization as the operator. */
  private def windowsOf(text: String): Seq[String] = {
    val w = Option(text).map(_.trim.toLowerCase.split("\\s+").toSeq).getOrElse(Seq.empty)
    w.grouped(ParagraphDedup.ParaWindowTokens).map(_.mkString(" ")).toSeq
  }

  test("planted fixture: copies, partial overlap, within-doc repeats, NULL text") {
    import spark.implicits._
    val a = "a1 a2 a3 a4 a5 a6 a7 a8"   // window A
    val b = "b1 b2 b3 b4 b5 b6 b7 b8"   // window B
    val c = "c1 c2 c3 c4 c5 c6 c7 c8"   // window C
    val d = Seq(
      (1L, s"$a $b"),        // first occurrence of A and B
      (2L, s"$a $c"),        // A dup (earlier in doc 1), C fresh → frac 0.5
      (3L, s"$a $b"),        // full copy of doc 1 → frac 1.0
      (4L, null),            // NULL text → 0 windows
      (5L, s"$c $c"),        // within-doc repeat: 2nd C dups doc 2's C; BOTH
                             // windows dup earlier content → frac 1.0
      (6L, "f1 f2 f3")       // single short fresh window → frac 0.0
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.paragraphDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out(1L) == ((2L, 0L, 0.0, true)))
    assert(out(2L) == ((2L, 1L, 0.5, false)))
    assert(out(3L) == ((2L, 2L, 1.0, false)))
    assert(out(4L) == ((0L, 0L, 0.0, true)), "NULL text: degenerate convention")
    assert(out(5L) == ((2L, 2L, 1.0, false)))
    assert(out(6L) == ((1L, 0L, 0.0, true)))
    // verdict attribution: doc 2's A window must point at (doc 1, idx 0)
    val v = ParagraphDedup.paragraphVerdicts(d)
      .filter(col("doc_id") === 2L && col("para_idx") === 0)
      .select("first_doc", "first_idx").head()
    assert(v.getLong(0) == 1L && v.getInt(1) == 0)
  }

  test("gate corpus: rollup matches an independent Scala recount") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // first-occurrence by (doc_id, para_idx) over all windows, in Scala
    val all = texts.sortBy(_._1).flatMap { case (id, t) =>
      windowsOf(t).zipWithIndex.map { case (p, i) => (id, i, p) }
    }
    val firstOf = all.groupBy(_._3).map { case (p, occ) =>
      p -> occ.map(o => (o._1, o._2)).min
    }
    val expected = all.groupBy(_._1).map { case (id, ws) =>
      id -> (ws.length.toLong,
        ws.count(w => firstOf(w._3) != ((w._1, w._2))).toLong)
    }
    val got = ParagraphDedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == texts.map(_._1).toSet, "every doc must emit a row")
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, recount $e")
    }
    // the gate corpus must exercise both branches (planted near-dups share
    // aligned windows; fresh docs share none)
    val fracs = ParagraphDedup.paragraphDedup(docs)
      .select("keep_paragraphs").collect().map(_.getBoolean(0))
    assert(fracs.contains(true) && fracs.contains(false),
      "gate corpus should split on the dup-fraction gate")
  }

  test("blank-line mode: real paragraph breaks, rewrap/case-invariant fingerprints") {
    import spark.implicits._
    val p1 = "The quick brown fox jumps over the lazy dog"
    val p2 = "Pack my box with five dozen liquor jugs"
    // doc 2's first paragraph is p1 CASE-SHIFTED and re-wrapped with a
    // single interior newline — per-paragraph normalization must make it
    // fingerprint identically to doc 1's (the quoted-boilerplate case)
    val rewrapped = p1.toUpperCase.replace("fox ", "fox \n").replace("JUMPS ", "JUMPS\n   ")
    val d = Seq(
      (1L, s"$p1\n\n$p2"),
      (2L, s"$rewrapped\n\n\nNovel content entirely here"),
      (3L, "Only fresh material in this single paragraph"),
      (4L, null)
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.paragraphDedup(d, blankLine = true).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out(1L) == ((2L, 0L, 0.0, true)))
    assert(out(2L) == ((2L, 1L, 0.5, false)), "rewrapped copy must dup against doc 1")
    assert(out(3L) == ((1L, 0L, 0.0, true)))
    assert(out(4L) == ((0L, 0L, 0.0, true)), "NULL text: degenerate convention")
    // the blank-line generator also keeps the inline-Generate discipline
    val pEx = ParagraphDedup.paragraphExploded(d, blankLine = true)
      .queryExecution.executedPlan.toString
    assert(!pEx.linesIterator.filter(_.contains("Filter ")).exists(_.contains("regexp_replace")),
      s"blank-line explode re-grew an inferred filter recomputing the paragraph array:\n$pEx")
  }

  test("incremental admission: batch windows probe only the corpus side; recount agrees") {
    import spark.implicits._
    val a = "a1 a2 a3 a4 a5 a6 a7 a8"
    val b = "b1 b2 b3 b4 b5 b6 b7 b8"
    val c = "c1 c2 c3 c4 c5 c6 c7 c8"
    // corpus = ids not % 5: 1 contributes A, 2 contributes B; batch = 0/5/10
    val d = Seq(
      (0L, s"$a $b"),   // both windows known in corpus → frac 1.0, rejected
      (1L, a), (2L, b),
      (5L, s"$a $c"),   // A known, C fresh → 0.5, rejected at 0.3
      (10L, s"$c $c"),  // C appears ONLY in batch docs — batch-internal
                        // repeats must NOT count as hits → frac 0, admitted
      (11L, null)       // corpus NULL doc contributes nothing
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.paragraphIncremental(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out.keySet == Set(0L, 5L, 10L), "one row per batch doc only")
    assert(out(0L) == ((2L, 2L, 1.0, false)))
    assert(out(5L) == ((2L, 1L, 0.5, false)))
    assert(out(10L) == ((2L, 0L, 0.0, true)), "batch-internal windows are not corpus hits")
    // gate corpus: recount hits against the corpus-side window set in Scala
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val mod = graft.operators.Dedup.IncrementalBatchMod
    val corpusSet = texts.filter(_._1 % mod != 0).flatMap(t => windowsOf(t._2)).toSet
    val expected = texts.filter(_._1 % mod == 0).map { case (id, t) =>
      val ws = windowsOf(t)
      id -> (ws.length.toLong, ws.count(corpusSet.contains).toLong)
    }.toMap
    val got = ParagraphDedup.paragraphIncremental(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, "gate-corpus incremental hits must match the Scala recount")
    val verdicts = ParagraphDedup.paragraphIncremental(docs)
      .select("is_new").collect().map(_.getBoolean(0))
    assert(verdicts.contains(true) && verdicts.contains(false),
      "gate corpus should exercise both admission branches")
  }

  test("plan shape: inline generator, materialized fp index feeds both consumers, hash join") {
    // the window expression must stay the Generate child — no inferred
    // filter recomputing the window array at the scan
    val pEx = ParagraphDedup.paragraphExploded(docs)
      .queryExecution.executedPlan.toString
    val filterLines = pEx.linesIterator.filter(_.contains("Filter ")).toSeq
    assert(!filterLines.exists(_.contains("array_join")),
      s"window explode re-grew an inferred filter recomputing the window array:\n$pEx")
    // downstream of the checkpoint: no Generate re-plan, no cartesian; the
    // fp self-alignment is a hash/merge join over the materialized index
    val p = ParagraphDedup.paragraphDedup(docs).queryExecution.executedPlan.toString
    assert(p.contains("Scan ExistingRDD"),
      s"verdict join must consume the checkpointed fp index:\n$p")
    assert(!p.contains("Generate"),
      s"rollup must not re-plan the window explode:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no pairwise comparison anywhere:\n$p")
  }

  test("bloom semi-join reduction: row-identical to the plain probe, and the sketch is honest") {
    val docs = Tables.documents(spark, sf)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
    val plain = ParagraphDedup.paragraphIncremental(docs)
      .collect().map(key).sortBy(_._1)
    // a loose fpp still must not change a single row (false positives are
    // resolved by the join they are routed to; false negatives impossible)
    val bloomed = ParagraphDedup.paragraphIncremental(docs, bloomFpp = Some(0.05))
      .collect().map(key).sortBy(_._1)
    assert(bloomed.sameElements(plain),
      s"diff=${bloomed.zip(plain).filter(p => p._1 != p._2).take(3).mkString(",")}")
    // the dial must actually split the batch: the gate corpus has both
    // known windows (hits > 0) and fresh ones (hit_frac < 1 rows exist)
    assert(plain.exists(_._3 > 0) && plain.exists(r => r._3 < r._2),
      "corpus must exercise both bloom branches for the identity to mean anything")
  }
}
