package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ParagraphClean, Pipeline, TextOps}

/** Composed pipeline: the rollup must equal a stage-wise recomposition
  * from the independently-oracled stage operators — on the gate corpus
  * and on a planted corpus exercising the zero-admitted-source row and
  * cross-source exact-dup rejection.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def recompose(docs: DataFrame): Map[String, (Long, Long, Long, Long, Long)] = {
    val admitted = TextOps.corpusFilter(docs).filter(col("admitted"))
      .select("doc_id", "text", "source")
    val srcOf = admitted.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cleaned = ParagraphClean.paragraphClean(admitted).collect()
      .map(r => (srcOf(r.getLong(0)), r.getLong(2), r.getLong(3), r.getLong(4)))
    val outBySrc = cleaned.groupBy(_._1).map { case (s, v) =>
      s -> ((v.size.toLong, v.map(_._2).sum, v.map(_._3).sum, v.map(_._4).sum))
    }
    docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      .map { case (s, nIn) =>
        val (na, nw, nr, tc) = outBySrc.getOrElse(s, (0L, 0L, 0L, 0L))
        s -> ((nIn, na, nw, nr, tc))
      }
  }

  private def run(docs: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
    Pipeline.curationPipelineQ(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("gate corpus: rollup equals the stage-wise recomposition") {
    val docs = Tables.documents(spark, sf)
    assert(run(docs) == recompose(docs))
  }

  test("planted: zero-admitted source keeps its row; cross-source dups rejected") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and then it runs away into the green field"
    val docs = Seq(
      (1L, good, "en", "a", good.length.toLong),
      (2L, good, "en", "b", good.length.toLong),          // exact dup of 1 → rejected
      (3L, "zz qq xx ww vv kk jj hh gg ff", "xx", "z", 30L) // unknown lang → rejected
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // ground truth for admission comes from the independently-oracled stage
    val adm = TextOps.corpusFilter(docs).filter(col("admitted"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(adm == Set(1L), "canonical quality doc admitted; dup + gibberish rejected")
    val out = run(docs)
    assert(out("b") == ((1L, 0L, 0L, 0L, 0L)), "dup-only source keeps its input row")
    assert(out("z") == ((1L, 0L, 0L, 0L, 0L)), "rejected-only source keeps its input row")
    assert(out("a")._1 == 1L && out("a")._2 == 1L && out("a")._5 > 0L)
    assert(out == recompose(docs))
  }
}
