package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Collocations

/** Collocation mining: planted corpus with hand-computed lifts, and a full
  * independent Scala recount + re-rank over the gate corpus.
  */
class CollocationsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted fixture: lift ranks the glued pair above the frequent pair") {
    import spark.implicits._
    // "alpha beta" always adjacent (perfect collocation); "the end" frequent
    // but 'the' is everywhere, diluting its lift; pair counts below 5 cut
    val docs = Seq(
      (1L, "alpha beta x the end y the end z alpha beta"),
      (2L, "alpha beta q the end r the end s alpha beta"),
      (3L, "the q the r the s the t alpha beta the end"),
      (4L, "alpha beta the end")
    ).toDF("doc_id", "text")
    val rows = Collocations.bigramPmi(docs, minPair = 5, k = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val n = 11 + 11 + 12 + 4 // total tokens = 38
    assert(rows.map(r => (r._2, r._3)).toSet == Set(("alpha", "beta"), ("the", "end")))
    val ab = rows.find(r => r._2 == "alpha").get
    val te = rows.find(r => r._2 == "the").get
    assert(ab._4 == 6L && ab._5 == 6L && ab._6 == 6L)
    assert(te._4 == 6L && te._5 == 10L && te._6 == 6L)
    assert(ab._7 == math.round(6.0 * n / (6 * 6) * 1e4) / 1e4)
    assert(te._7 == math.round(6.0 * n / (10 * 6) * 1e4) / 1e4)
    assert(ab._1 == 1 && te._1 == 2, "perfect collocation outranks the diluted pair")
  }

  test("gate corpus: top-K matches an independent Scala recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap(r => Option(r.getString(1)))
      .map(_.trim.toLowerCase.split("\\s+").toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val n = uni.values.sum
    val pairs = docs.flatMap(w => w.zip(w.drop(1)))
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
      .filter(_._2 >= Collocations.MinPairCount)
    val expected = pairs.toSeq.map { case ((x, y), cxy) =>
      (x, y, cxy, uni(x), uni(y), cxy.toDouble * n / (uni(x) * uni(y)))
    }.sortBy { case (x, y, _, _, _, lift) => (-lift, x, y) }
      .take(Collocations.TopK)
      .zipWithIndex
      .map { case ((x, y, cxy, cx, cy, lift), i) =>
        (i + 1, x, y, cxy, cx, cy, math.round(lift * 1e4) / 1e4) }
    val got = Collocations.bigramPmiQ(Tables.documents(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expected)
  }
}
