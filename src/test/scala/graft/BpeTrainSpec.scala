package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BPE merge learning: the Sennrich toy corpus with hand-computed first
  * merges, and full merge-table equality against an independent in-memory
  * Scala BPE at gate scale (the no-SQL-oracle stand-in).
  */
class BpeTrainSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Independent reference BPE (word-freq domain, greedy leftmost apply,
    * (count DESC, left, right) argmax). */
  private def refBpe(wordFreq: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab = wordFreq.map { case (w, f) =>
      (w.toCharArray.map(_.toString).toSeq :+ BpeTrain.EowMarker) -> f }.toSeq
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f) }
      if (counts.nonEmpty) {
        val ((x, y), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, x, y, cnt))
        vocab = vocab.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == x && s == y) acc(acc.size - 1) = x + y
            else acc += s }
          acc.toSeq -> f }
      }
    }
    out.result()
  }

  test("toy corpus: first merges follow pair frequency with total-order ties") {
    import spark.implicits._
    // 'low'x5, 'lowest'x2: (l,o) and (o,w) both appear 7x; tie broken by
    // left symbol — 'l' < 'o' so (l,o) merges first, then (lo,w)
    val docs = Seq((1L, "low low low low low lowest lowest")).toDF("doc_id", "text")
    val got = BpeTrain.bpeMerges(docs, numMerges = 3)
    val exp = refBpe(Map("low" -> 5L, "lowest" -> 2L), 3)
    assert(got == exp)
    assert(got.head._2 == "l" && got.head._3 == "o" && got.head._4 == 7L)
    assert(got(1)._2 == "lo" && got(1)._3 == "w" && got(1)._4 == 7L)
  }

  test("greedy leftmost application: runs of a repeated char merge pairwise") {
    import spark.implicits._
    // 'aaaa' -> (a,a) count 3 (overlaps counted per adjacency), apply
    // leaves [aa, aa, </w>]; reference implementation agrees
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val got = BpeTrain.bpeMerges(docs, numMerges = 2)
    val exp = refBpe(Map("aaaa" -> 2L), 2)
    assert(got == exp)
  }

  test("gate corpus: merge table equals the independent reference BPE") {
    val wf = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => Option(r.getString(0)))
      .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val got = BpeTrain.bpeMerges(Tables.documents(spark, sf))
    val exp = refBpe(wf, BpeTrain.NumMerges)
    assert(got == exp)
  }
}
