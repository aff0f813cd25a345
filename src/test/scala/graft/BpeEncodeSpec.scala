package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeEncode, BpeTrain}

/** BPE application: the committed merge table is re-derived from its
  * training corpus, hand-computed segmentations pin the replace-chain
  * semantics (including adjacent-run greediness), and a full independent
  * Scala apply recounts the gate corpus.
  */
class BpeEncodeSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Independent greedy-leftmost BPE apply over one word. */
  private def applyMerges(word: String): Seq[String] = {
    var syms: Seq[String] = word.toCharArray.map(_.toString).toSeq :+ BpeTrain.EowMarker
    BpeEncode.Merges.foreach { case (x, y) =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { s =>
        if (acc.nonEmpty && acc.last == x && s == y) acc(acc.size - 1) = x + y
        else acc += s }
      syms = acc.toSeq
    }
    syms
  }

  test("committed merge table IS the sf0.01 training output") {
    val trained = BpeTrain.bpeMerges(Tables.documents(spark, "/root/testdata/sf0.01"))
    assert(trained.map(m => (m._2, m._3)) == BpeEncode.Merges)
  }

  test("hand-checked segmentations: learned subwords and greedy runs") {
    import spark.implicits._
    // 'join' -> merges 20/21 fuse it to one symbol: [join</w>] -> n_sym 1
    // 'hash' -> merges 22/23/24: [hash</w>] -> 1; 'lower': l+ow+er</w> -> 3
    // 'zzzz': no z merges -> 5 symbols (4 chars + eow)
    val docs = Seq((1L, "join hash lower zzzz join")).toDF("doc_id", "text")
    assert(applyMerges("join") == Seq("join</w>"))
    assert(applyMerges("hash") == Seq("hash</w>"))
    assert(applyMerges("lower") == Seq("l", "ow", "er</w>"))
    assert(applyMerges("zzzz") == Seq("z", "z", "z", "z", "</w>"))
    val row = BpeEncode.bpeEncodeQ(docs).collect().head
    // 5 words; subwords = 1 + 1 + 3 + 5 + 1 = 11
    assert((row.getLong(1), row.getLong(2)) == (5L, 11L))
    assert(row.getDouble(3) == math.round(11.0 / 5 * 1e4) / 1e4)
  }

  test("gate corpus: per-doc fertility matches an independent Scala apply") {
    val cache = scala.collection.mutable.Map.empty[String, Int]
    def nSym(w: String) = cache.getOrElseUpdate(w, applyMerges(w).size)
    val expected = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        val words = Option(r.getString(1)).toSeq
          .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
        if (words.isEmpty) None
        else Some(r.getLong(0) -> (words.size.toLong, words.map(w => nSym(w).toLong).sum))
      }.toMap
    val got = BpeEncode.bpeEncodeQ(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }
}
