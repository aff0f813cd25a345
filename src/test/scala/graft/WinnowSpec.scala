package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Winnow

class WinnowSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private def md5hex8(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString.substring(0, 8)
  }

  /** Reference winnowing: k-gram hashes, rightmost-min per w-window
    * (single window when 0 < n_grams < w), distinct picks. */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Long, String)] = {
    if (text == null) return Set.empty
    val toks = text.trim.toLowerCase.split("\\s+")
    val grams = (0 to toks.length - k).map(s => toks.slice(s, s + k).mkString(" "))
    val hs = grams.map(md5hex8)
    if (hs.isEmpty) return Set.empty
    val starts = 0 to math.max(hs.length - w, 0)
    starts.map { s =>
      val win = hs.zipWithIndex.slice(s, s + w)
      // min hash, rightmost position on ties
      val best = win.reduceLeft { (acc, x) =>
        if (x._1 < acc._1 || (x._1 == acc._1 && x._2 > acc._2)) x else acc
      }
      (best._2.toLong, best._1)
    }.toSet
  }

  test("winnow fingerprints match an independent Scala recount on the gate corpus") {
    val expected = docs.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val t = if (r.isNullAt(1)) null else r.getString(1)
      winnowRef(t, Winnow.GramTokens, Winnow.WindowGrams)
        .map { case (p, h) => (id, p, h) }
    }.toSet
    val got = Winnow.winnowFingerprint(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected,
      s"winnow mismatch: ${(got -- expected).take(3)} extra, ${(expected -- got).take(3)} missing")
    assert(got.nonEmpty, "gate corpus yields no fingerprints")
  }

  test("winnowing guarantee: first pick inside window 0, consecutive gaps <= w") {
    // at least one fingerprint per w-gram window means sorted positions
    // start below w and never gap by more than w
    val w = Winnow.WindowGrams
    val byDoc = Winnow.winnowFingerprint(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.head < w, s"doc $id first pick ${ps.head} outside window 0")
      ps.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= w, s"doc $id gap $a -> $b exceeds $w")
        case _ =>
      }
    }
  }

  test("tie-break is rightmost: a constant-token doc selects positions w-1..n-1") {
    // all grams identical -> every window is an all-tie -> rightmost wins
    import spark.implicits._
    val n = 10 // tokens; grams = n-k+1
    val one = Seq((1L, Seq.fill(n)("tok").mkString(" "))).toDF("doc_id", "text")
    val k = Winnow.GramTokens; val w = Winnow.WindowGrams
    val nGrams = n - k + 1
    val got = Winnow.winnowFingerprint(one).collect()
      .map(r => r.getLong(1)).sorted
    assert(got.toSeq == ((w - 1).toLong until nGrams.toLong).toSeq,
      s"expected rightmost-of-each-window, got ${got.toSeq}")
  }

  test("short and degenerate docs: <k tokens no rows, <w grams one window") {
    import spark.implicits._
    val cases = Seq(
      (1L, "a b c"),                   // 3 tokens < k=4 -> no grams
      (2L, null.asInstanceOf[String]), // NULL -> no rows
      (3L, "   "),                     // ws-only -> [''] -> no grams
      (4L, "a b c d e")                // 2 grams < w -> single window, 1 pick
    ).toDF("doc_id", "text")
    val got = Winnow.winnowFingerprint(cases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(!got.exists(r => Seq(1L, 2L, 3L).contains(r._1)))
    val d4 = got.filter(_._1 == 4L)
    assert(d4.length == 1, s"doc 4 should emit exactly one pick, got ${d4.toSeq}")
    assert(winnowRef("a b c d e", 4, 4) == d4.map(r => (r._2, r._3)).toSet)
  }

  test("overlap pairs cross-derive from the fingerprint index") {
    // ground truth: per-doc distinct fp sets from the fingerprint operator,
    // pairwise intersections >= MinSharedFps recomputed driver-side
    val byDoc = Winnow.winnowFingerprint(docs).collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
    val ids = byDoc.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      shared = (byDoc(a) & byDoc(b)).size
      if shared >= Winnow.MinSharedFps
    } yield (a, b) -> (shared.toLong, byDoc(a).size.toLong, byDoc(b).size.toLong)).toMap
    val got = Winnow.winnowOverlap(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == expected.keySet,
      s"pair set mismatch: extra ${(got.keySet -- expected.keySet).take(3)}, " +
        s"missing ${(expected.keySet -- got.keySet).take(3)}")
    got.foreach { case (pair, (shared, n1, n2, cont)) =>
      val (es, en1, en2) = expected(pair)
      assert((shared, n1, n2) == ((es, en1, en2)), s"pair $pair counts")
      assert(math.abs(cont - shared.toDouble / math.min(n1, n2)) < 1e-12)
    }
    assert(got.nonEmpty, "gate corpus yields no overlap pairs")
  }

  test("containment catches a short doc embedded in a long one") {
    // B's first 16 tokens are a verbatim run from inside A, padded with
    // unrelated tail tokens: containment(B in A) must be high while the
    // pair's shingle Jaccard stays low (the asymmetric-copy case the
    // min-side normalizer exists for)
    import spark.implicits._
    val aToks = (1 to 40).map(i => s"w$i")
    val run = aToks.slice(10, 26) // 16 tokens, >= 2(w+k-1)
    val bToks = run ++ (1 to 30).map(i => s"z$i")
    val two = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Winnow.winnowOverlap(two).collect()
    assert(rows.length == 1, s"expected the embedded pair, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) >= 2, "at least two guaranteed shared picks")
    // Jaccard on distinct word bigrams for contrast: |inter|/|union| small
    val shA = aToks.sliding(2).map(_.mkString(" ")).toSet
    val shB = bToks.sliding(2).map(_.mkString(" ")).toSet
    val jac = (shA & shB).size.toDouble / (shA | shB).size
    assert(jac < 0.3, s"planted pair should be Jaccard-low, got $jac")
    assert(r.getDouble(5) >= 0.15,
      s"containment should clear the noise floor, got ${r.getDouble(5)}")
  }

  test("overlap plan: hash join on fp, no cartesian product") {
    val plan = Winnow.winnowOverlap(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("plan: pure map + inline generator, zero exchanges before the sort") {
    val plan = Winnow.winnowFingerprint(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // the generator child must be the selection expression, not a named
    // projected array column (the §invariants explode rule)
    val analyzed = Winnow.winnowFingerprint(docs).queryExecution.analyzed.toString
    assert(analyzed.contains("array_distinct"), analyzed)
  }
}
