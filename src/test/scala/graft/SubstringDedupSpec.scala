package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DupSpans, SubstringDedup}

/** Suffix-granularity exact-substring dedup: alignment-free maximal
  * duplicated runs ≥ 8 tokens, including exactly the cases the stride-8
  * window grid structurally misses; on grid-aligned duplicates the
  * windowed form is the oracle (token bounds agree). */
class SubstringDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def spans(docs: org.apache.spark.sql.DataFrame) =
    SubstringDedup.substringDedupQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  /** The maxDf contract's unit: per-doc covered TOKEN positions. */
  private def coverage(rows: Seq[(Long, Long, Long, Long, Long, Long)]) =
    rows.flatMap { case (d, _, _, _, st, et) => (st to et).map(d -> _) }.toSet

  test("off-grid 10-token run: found exactly where the window grid misses it") {
    // doc 1 carries the shared run r1..r10 at token 5 (straddles the
    // 8-token grid: covers no full grid window); doc 2 carries it at
    // token 1. Every filler token is corpus-unique.
    val docs = Seq(
      (1L, "a1 a2 a3 a4 r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 a5 a6 a7 a8 a9 a10"),
      (2L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 b1 b2 b3 b4 b5 b6"))
      .toDF("doc_id", "text")
    // 10-token run = 3 duplicated stride-1 gram positions; maximal spans
    // recover the full extents: doc 1 tokens [5,14], doc 2 tokens [1,10]
    assert(spans(docs) == Seq(
      (1L, 5L, 7L, 3L, 5L, 14L),
      (2L, 1L, 3L, 3L, 1L, 10L)))
    // the grid form misses it entirely: no grid-aligned window of doc 1
    // lies inside tokens 5..14, and doc 2's windows differ from doc 1's
    assert(DupSpans.dupSpanMerge(docs).count() == 0,
      "fixture vacuous: the window grid caught the straddling run")
  }

  test("grid-aligned duplicate: the windowed form is the oracle for token bounds") {
    val t16 = (1 to 16).map(i => s"c$i").mkString(" ")
    val docs = Seq((3L, t16), (4L, t16)).toDF("doc_id", "text")
    // all 9 gram positions duplicated in BOTH docs (a suffix array flags
    // every occurrence; the window form flags only duplicates-of-earlier)
    assert(spans(docs) == Seq(
      (3L, 1L, 9L, 9L, 1L, 16L),
      (4L, 1L, 9L, 9L, 1L, 16L)))
    val grid = DupSpans.dupSpanMerge(docs).collect()
    assert(grid.length == 1 && grid.head.getLong(0) == 4L)
    // DupSpans tokens are 0-based half-open [start, end); ours 1-based
    // inclusive — same extent
    assert(grid.head.getAs[Int]("start_token") + 1 == 1 &&
      grid.head.getAs[Int]("end_token") == 16)
  }

  test("within-doc repetition counts: both occurrences reported as separate spans") {
    val run = (1 to 8).map(i => s"x$i").mkString(" ")
    val docs = Seq((5L, s"$run y1 $run")).toDF("doc_id", "text")
    assert(spans(docs) == Seq(
      (5L, 1L, 1L, 1L, 1L, 8L),
      (5L, 10L, 10L, 1L, 10L, 17L)))
  }

  test("overlapping self-similar run merges to one maximal span") {
    val docs = Seq((6L, Seq.fill(9)("z").mkString(" "))).toDF("doc_id", "text")
    assert(spans(docs) == Seq((6L, 1L, 2L, 2L, 1L, 9L)))
  }

  test("short, empty and null docs are total and emit nothing") {
    val docs = Seq((7L, "only seven tokens are in here now"),
      (8L, ""), (9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(spans(docs).isEmpty)
    assert(spans(Seq.empty[(Long, String)].toDF("doc_id", "text")).isEmpty)
  }

  private def cleans(docs: org.apache.spark.sql.DataFrame) =
    SubstringDedup.substringCleanQ(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("clean: non-first copy of the off-grid run excised, first copy intact") {
    val docs = Seq(
      (1L, "a1 a2 a3 a4 r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 a5 a6 a7 a8 a9 a10"),
      (2L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 b1 b2 b3 b4 b5 b6"))
      .toDF("doc_id", "text")
    // doc 1 owns the first occurrence (doc_id order) and survives whole;
    // doc 2 loses tokens 1..10
    assert(cleans(docs) == Seq(
      (1L, "a1 a2 a3 a4 r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 a5 a6 a7 a8 a9 a10", 20L, 0L),
      (2L, "b1 b2 b3 b4 b5 b6", 16L, 10L)))
  }

  test("clean: within-doc repeat keeps the first occurrence only") {
    val run = (1 to 8).map(i => s"x$i").mkString(" ")
    val docs = Seq((5L, s"$run y1 $run")).toDF("doc_id", "text")
    assert(cleans(docs) == Seq((5L, s"$run y1", 17L, 8L)))
  }

  test("clean: exact whole-doc duplicate collapses to empty, first copy whole") {
    val t8 = (1 to 8).map(i => s"d$i").mkString(" ")
    val docs = Seq((7L, t8), (8L, t8)).toDF("doc_id", "text")
    assert(cleans(docs) == Seq((7L, t8, 8L, 0L), (8L, "", 8L, 8L)))
  }

  test("clean is idempotent: cleaning the cleaned corpus changes nothing") {
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $run a5 a6"),
      (2L, s"$run b1 b2"),
      (3L, s"c1 $run c2 c3")).toDF("doc_id", "text")
    val once = SubstringDedup.substringCleanQ(docs)
    val again = cleans(once.select(col("doc_id"), col("clean_text").as("text")))
    assert(again.map(r => (r._1, r._2, r._4)) ==
      once.collect().map(r => (r.getLong(0), r.getString(1), 0L)).toSeq,
      "second clean pass found removals — not idempotent")
  }

  test("incremental: batch spans flagged only against the CORPUS, batch-internal repeats excluded") {
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val xr = (1 to 8).map(i => s"x$i").mkString(" ")
    val sh = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      // corpus (doc_id % 5 != 0)
      (1L, s"c1 c2 $run c3"),
      (2L, "f1 f2 f3 f4 f5 f6 f7 f8 f9"),
      // batch (doc_id % 5 == 0)
      (10L, s"u1 u2 u3 u4 $run u5"),      // shares the run with corpus doc 1
      (15L, s"$xr y1 $xr"),                // batch-INTERNAL repeat only
      (20L, s"$sh z1"), (25L, s"z2 $sh")   // batch-batch share only
    ).toDF("doc_id", "text")
    val rows = SubstringDedup.substringIncrementalQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // only doc 10's run is a duplicate OF THE CORPUS: tokens 5..14
    assert(rows == Seq((10L, 5L, 7L, 3L, 5L, 14L)))
  }

  test("incremental: empty batch and empty corpus are total") {
    val t16 = (1 to 16).map(i => s"c$i").mkString(" ")
    val onlyCorpus = Seq((1L, t16), (2L, t16)).toDF("doc_id", "text")
    assert(SubstringDedup.substringIncremental(onlyCorpus).count() == 0)
    val onlyBatch = Seq((5L, t16), (10L, t16)).toDF("doc_id", "text")
    assert(SubstringDedup.substringIncremental(onlyBatch).count() == 0)
  }

  test("maxDf dial: hot grams dropped lossily — subset semantics, identity at a loose cap") {
    // run r (df=3, hot) and run q (df=2, cold): a cap of 2 keeps only
    // the cold run's spans; a loose cap is the exact answer
    val r = (1 to 8).map(i => s"r$i").mkString(" ")
    val q = (1 to 8).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"$r a1"), (2L, s"$r a2"), (3L, s"$r a3"),
      (4L, s"$q b1"), (5L, s"$q b2")).toDF("doc_id", "text")
    val exact = spans(docs)
    assert(exact.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    val capped = SubstringDedup.substringDedup(docs, maxDf = Some(2L))
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(capped.map(_._1).toSet == Set(4L, 5L),
      s"cap=2 must keep only the df-2 run's docs: $capped")
    // whole-run vanish case: here rows happen to survive intact, so the
    // row set IS a subset — the general contract (interior-hot split) is
    // coverage-only, pinned in the next test
    assert(coverage(capped).subsetOf(coverage(exact)),
      "covered tokens grew under a cap")
    val loose = SubstringDedup.substringDedup(docs, maxDf = Some(1000L))
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(loose == exact, "loose cap must be the exact answer")
  }

  test("maxDf: a hot gram INTERIOR to a cold run splits the span — coverage subset, NOT row subset") {
    // docs 1-2 share a 20-token run (every stride-1 8-gram df=2, cold);
    // the 8-gram at token positions 4..11 ALSO appears alone in docs
    // 3-5, lifting its df to 5. cap=4 drops exactly that gram: doc 1/2's
    // exact span [pos 1..13] re-groups around the hole into [1..3] +
    // [5..13] — TWO rows, NEITHER in the exact answer — while the
    // covered TOKEN set only shrinks (docs 3-5 vanish; doc 1/2 coverage
    // is even unchanged: tokens 1..10 ∪ 5..20 = 1..20).
    val run = (1 to 20).map(i => s"w$i").mkString(" ")
    val hot = (4 to 11).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, run), (2L, run), (3L, hot), (4L, hot), (5L, hot))
      .toDF("doc_id", "text")
    val exact = spans(docs)
    assert(exact.filter(_._1 == 1L) == Seq((1L, 1L, 13L, 13L, 1L, 20L)),
      s"exact fixture drifted: $exact")
    val capped = SubstringDedup.substringDedup(docs, maxDf = Some(4L))
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(capped.filter(_._1 == 1L) ==
      Seq((1L, 1L, 3L, 3L, 1L, 10L), (1L, 5L, 13L, 9L, 5L, 20L)),
      s"interior-hot split not as hand-computed: $capped")
    assert(!capped.exists(_._1 >= 3L), "hot-only docs must vanish under the cap")
    // the split rows are NOT a row-subset of the exact answer…
    assert(!capped.toSet.subsetOf(exact.toSet),
      "fixture vacuous: capped rows were a row-subset")
    // …the contract that DOES hold is token coverage
    assert(coverage(capped).subsetOf(coverage(exact)),
      "covered tokens grew under a cap")
  }

  test("semi-join verdict ≡ count-window verdict on the gate corpus (row identity)") {
    // the production form trades the window for a map-combinable df agg +
    // skew-splittable semi join (hot-gram headroom); same rows exactly
    val docs = Tables.documents(spark, sf)
    val semi = spans(docs)
    val win = SubstringDedup.substringDedupViaWindow(docs)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(semi.nonEmpty && semi == win)
  }

  test("gate corpus: every duplicated FULL grid window lies inside a suffix span") {
    // stride-1 detection dominates the grid window-by-window (a duplicated
    // full window's 8-gram is duplicated corpus-wide); NOT span-by-span —
    // adjacent grid windows duplicated in different places merge in the
    // grid form without their straddling grams being duplicated, and a
    // short tail window has no 8-gram at all, so those are skipped.
    val docs = Tables.documents(spark, sf)
    val sub = spans(docs)
    assert(sub.nonEmpty, "no duplicated >=8-token runs at gate SF")
    val byDoc = sub.groupBy(_._1)
    val width = graft.operators.ParagraphDedup.ParaWindowTokens
    DupSpans.dupSpanMerge(docs).collect().foreach { g =>
      val doc = g.getLong(0)
      val endTok = g.getAs[Int]("end_token").toLong
      val (s0, s1) = (g.getAs[Number]("span_start").longValue,
        g.getAs[Number]("span_end").longValue)
      (s0 to s1).foreach { w =>
        val ws = w * width + 1
        val we = math.min(w * width + width, endTok)
        if (we - ws + 1 == width)
          assert(byDoc.get(doc).exists(_.exists(s => s._5 <= ws && we <= s._6)),
            s"grid window [$ws,$we] of doc $doc not covered by any suffix span")
      }
    }
  }
}
