package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DocChunk

/** Overlapping chunking invariants: exact tiling algebra (coverage with
  * W−S overlap), reconstruction of the token stream from stride prefixes,
  * degenerate docs, and the zero-exchange map+generator plan shape.
  */
class DocChunkSpec extends AnyFunSuite {
  import SparkTestSession._

  test("chunk algebra: starts at stride multiples, overlap W−S, exact coverage") {
    import spark.implicits._
    val (w, s) = (DocChunk.ChunkTokens, DocChunk.ChunkStride)
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens: 5 chunks
      (2L, (1 to 24).map(i => s"u$i").mkString(" ")),  // exactly one stride
      (3L, "a b"),                                     // shorter than W
      (4L, ""),                                        // empty: 1 empty-token chunk
      (5L, (1 to 33).map(i => s"v$i").mkString(" ")))  // W+1: 2 chunks, tail len 9
      .toDF("doc_id", "text")
    val rows = DocChunk.docChunk(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).length == 5 && byDoc(2L).length == 1 &&
      byDoc(3L).length == 1 && byDoc(4L).length == 1 && byDoc(5L).length == 2)
    byDoc.foreach { case (_, cs) =>
      val n = cs.head._6
      cs.sortBy(_._2).zipWithIndex.foreach { case ((_, cid, start, len, text, _), i) =>
        assert(cid == i && start == i.toLong * s)
        assert(len == math.min(w.toLong, n - start))
        assert(text.split(" ", -1).length == len)
      }
      // every token covered: chunk starts tile [0, n) with stride s
      val last = cs.map(_._2).max
      assert(last * s < n && (last + 1) * s >= n)
    }
    // doc 5 tail: starts at 24, carries tokens 25..33 (9 tokens, 8 overlap-free)
    val tail5 = byDoc(5L).maxBy(_._2)
    assert(tail5._4 == 9 && tail5._5.startsWith("v25") && tail5._5.endsWith("v33"))
    // empty doc: one chunk of the single empty token
    assert(byDoc(4L).head._4 == 1 && byDoc(4L).head._5 == "")
  }

  test("sf0.001 corpus: concatenating stride prefixes reconstructs every doc") {
    val docs = Tables.documents(spark, sf)
    val s = DocChunk.ChunkStride
    val chunks = DocChunk.docChunkQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4), r.getLong(3)))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val rebuilt = cs.sortBy(_._2)
        .map { case (_, _, text, len) =>
          val toks = text.split(" ", -1)
          toks.take(math.min(s, toks.length)).mkString(" ")
        }.mkString(" ")
      val expected = texts(id).trim.replaceAll("\\s+", " ")
      assert(rebuilt == expected, s"doc $id reconstruction")
    }
  }

  test("plan: single map + inline generator, zero exchanges before output sort") {
    val docs = Tables.documents(spark, sf)
    val plan = DocChunk.docChunk(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Generate"), plan)
    // the split must not leak into a scan-side Filter (the inline-explode rule)
    val filterLines = plan.linesIterator.filter(_.contains("Filter")).mkString("\n")
    assert(!filterLines.contains("split("), s"split recomputed in a Filter:\n$filterLines")
  }
}
