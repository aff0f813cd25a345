package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skipgram

/** Windowed co-occurrence: planted window-enumeration algebra (exact pair
  * set for a known token line, duplicate-token canonicalization) and a
  * full independent Scala recount + re-rank over the gate corpus.
  */
class SkipgramSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: window-3 pair enumeration and unordered canonicalization") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "x y x")).toDF("doc_id", "text")
    val rows = Skipgram.skipgramCooccur(docs, windowK = 3, minPair = 1, k = 100)
      .collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    // doc 1 (|i-j|<=3): ab ac ad bc bd be cd ce de; doc 2: xy (d1), xx (d2), xy (d1)
    val expected = Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L, ("a", "d") -> 1L,
      ("b", "c") -> 1L, ("b", "d") -> 1L, ("b", "e") -> 1L,
      ("c", "d") -> 1L, ("c", "e") -> 1L, ("d", "e") -> 1L,
      ("x", "y") -> 2L, ("x", "x") -> 1L)
    assert(rows == expected)
  }

  test("planted: lift ranking — exclusive pair outranks the diluted one") {
    import spark.implicits._
    // "p q" glued pairs; "t u" co-occur but t floods the unigram count
    val docs = Seq(
      (1L, "p q t t t t u"),
      (2L, "p q t t t t u")).toDF("doc_id", "text")
    val out = Skipgram.skipgramCooccur(docs, windowK = 3, minPair = 2, k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val pq = out.find(r => r._2 == "p" && r._3 == "q").get
    val tu = out.find(r => r._2 == "t" && r._3 == "u").get
    assert(pq._1 < tu._1, s"exclusive pair must outrank: $pq vs $tu")
  }

  test("gate corpus: top-K matches an independent Scala window recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap(r => Option(r.getString(1)))
      .map(_.trim.toLowerCase.split("\\s+").toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val n = uni.values.sum
    val pairs = docs.flatMap { w =>
      for {
        i <- w.indices
        j <- (i + 1) to math.min(i + Skipgram.WindowK, w.size - 1)
      } yield if (w(i) <= w(j)) (w(i), w(j)) else (w(j), w(i))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
      .filter(_._2 >= Skipgram.MinPairCount)
    val expected = pairs.toSeq.map { case ((a, b), cab) =>
      (a, b, cab, uni(a), uni(b), cab.toDouble * n / (uni(a) * uni(b)))
    }.sortBy { case (a, b, _, _, _, lift) => (-lift, a, b) }
      .take(Skipgram.TopK)
      .zipWithIndex
      .map { case ((a, b, cab, ca, cb, lift), i) =>
        (i + 1, a, b, cab, ca, cb, math.round(lift * 1e4) / 1e4) }
    val got = Skipgram.skipgramCooccurQ(Tables.documents(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expected)
  }
}
