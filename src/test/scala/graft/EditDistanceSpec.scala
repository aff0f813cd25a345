package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EditDistance

/** Levenshtein-verified near-dup pairs: planted edits with hand-checked
  * distances, the candidate floor, and a full independent Scala DP recount
  * over the gate corpus.
  */
class EditDistanceSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Classic single-char-op Levenshtein DP (the contract both engines
    * implement), for independent verification. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  test("planted fixture: one-word edit verifies, unrelated doc never pairs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val edit = "alpha beta gamma delta epsilon zeta eta theta iota kappz"
    val far  = "completely different text with no overlap whatsoever here now"
    // 10 tokens -> 7 windows; only the last window contains the edited
    // token, so 6 survive; 'far' shares zero
    val docs = Seq((1L, base), (2L, edit), (3L, far)).toDF("doc_id", "text")
    val rows = EditDistance.editDistanceQ(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6))))
      .toMap
    assert(rows.keySet == Set((1L, 2L)))
    val (shared, len1, len2, dist, sim) = rows((1L, 2L))
    assert(dist == 1 && len1 == base.length && len2 == edit.length)
    assert(shared == 6L)
    assert(sim == math.round((1.0 - 1.0 / base.length) * 1e4) / 1e4)
  }

  test("candidate floor: a single shared 4-gram is not a candidate") {
    import spark.implicits._
    // exactly one shared window ('a b c d'), texts otherwise disjoint and
    // far apart in edit space
    val docs = Seq(
      (1L, "a b c d q r s t u v w x y z"),
      (2L, "m n o p a b c d")).toDF("doc_id", "text")
    assert(EditDistance.editDistanceQ(docs).collect().isEmpty)
  }

  test("gate corpus: pair set matches an independent Scala recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).map(_.trim.toLowerCase).getOrElse(""))
    val grams = docs.map { case (id, t) =>
      id -> t.split("\\s+").toSeq.sliding(4).filter(_.size == 4)
        .map(_.mkString(" ")).toSet }.toMap
    val text = docs.toMap
    val ids = docs.map(_._1).sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      id1 = ids(i); id2 = ids(j)
      shared = (grams(id1) & grams(id2)).size
      if shared >= EditDistance.MinShared
      t1 = text(id1); t2 = text(id2)
      d = lev(t1, t2)
      sim = 1.0 - d.toDouble / math.max(t1.length, t2.length)
      if sim >= EditDistance.EditSimThreshold
    } yield (id1, id2, shared.toLong, t1.length, t2.length, d,
      math.round(sim * 1e4) / 1e4)).toSeq
    val got = EditDistance.editDistanceQ(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getDouble(6))).toSeq
    assert(got == expected)
  }
}
