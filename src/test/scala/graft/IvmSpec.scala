package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ivm

/** The delta-rule contract: maintained view == full recompute on a
  * planted mixed batch, batch CHAINING composes, and a group deleted to
  * zero nets OUT of the view (no zero ghost). */
class IvmSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rowsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "fp")

  private def batchDf(rows: Seq[(Long, String, String, String)]): DataFrame =
    rows.toDF("doc_id", "op", "fp", "src")

  private def viewSet(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private val rows0 = Seq(
    (1L, "a", "000a"), (2L, "a", "0014"), (3L, "b", "0100"))
  private val batch1 = Seq(
    (1L, "delete", null.asInstanceOf[String], null.asInstanceOf[String]),
    (2L, "update", "001e", null.asInstanceOf[String]),
    (4L, "insert", "0002", "c"))
  private val rows1 = Seq(
    (2L, "a", "001e"), (3L, "b", "0100"), (4L, "c", "0002"))

  test("planted mixed batch: maintained view equals full recompute") {
    val m = Ivm.maintain(Ivm.viewOf(rowsDf(rows0)), rowsDf(rows0), batchDf(batch1))
    assert(viewSet(m) == Set(("a", 1L, 30L), ("b", 1L, 256L), ("c", 1L, 2L)),
      s"maintained: ${viewSet(m)}")
    assert(viewSet(m) == viewSet(Ivm.viewOf(rowsDf(rows1))), "≠ recompute")
  }

  test("chained batches compose; delete-to-zero group nets out of the view") {
    val v1 = Ivm.maintain(Ivm.viewOf(rowsDf(rows0)), rowsDf(rows0), batchDf(batch1))
    val batch2 = Seq(
      (3L, "delete", null.asInstanceOf[String], null.asInstanceOf[String]),
      (4L, "update", "0003", null.asInstanceOf[String]),
      (5L, "insert", "0010", "a"))
    val v2 = Ivm.maintain(v1, rowsDf(rows1), batchDf(batch2))
    val rows2 = Seq((2L, "a", "001e"), (4L, "c", "0003"), (5L, "a", "0010"))
    assert(viewSet(v2) == viewSet(Ivm.viewOf(rowsDf(rows2))), "chained ≠ recompute")
    assert(!viewSet(v2).exists(_._1 == "b"), "deleted-out group left a zero ghost")
  }

  test("gate shape: registered query equals a direct post-batch recompute") {
    val docs = Tables.documents(spark, sf)
    val got = viewSet(graft.operators.Ivm.incrementalViewMaintainQ(docs))
    assert(got.nonEmpty && got.forall(_._2 > 0), s"degenerate view: $got")
    // n_docs balance: base - deletes + inserts (fates 0,1 vs e,f)
    import org.apache.spark.sql.functions._
    val keyed = docs.selectExpr("doc_id",
      "substring(md5(concat('graft-cdc:', CAST(doc_id AS STRING))), 1, 1) AS k")
    val base = docs.count()
    val dels = keyed.filter(col("k").isin("0", "1")).count()
    val ins = keyed.filter(col("k").isin("e", "f")).count()
    assert(got.toSeq.map(_._2).sum == base - dels + ins, "doc-count balance broke")
  }
}
