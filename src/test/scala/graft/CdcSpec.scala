package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** CDC merge + time travel: planted upsert/delete semantics with an
  * explicit change batch, log reconstruction at every version, and the
  * synthetic-batch bookkeeping identity on the gate corpus.
  */
class CdcSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: merge keeps / updates / inserts / deletes exactly") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val changes = Seq(
      (2L, "update", Some("FP-U")),
      (3L, "delete", None),
      (9L, "insert", Some("FP-I")))
      .toDF("doc_id", "op", "fp")
    val out = Cdc.cdcApply(snap, changes).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((1L, "kept"), (2L, "updated"), (9L, "inserted")))
  }

  test("planted: snapshot_at reconstructs each version from the log") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "insert", Some("A1")), (1L, 2L, "update", Some("A2")),
      (2L, 1L, "insert", Some("B1")), (2L, 3L, "delete", None))
      .toDF("doc_id", "version", "op", "fp")
    def at(v: Long): Seq[(Long, String)] =
      Cdc.snapshotAt(log, v).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(at(1L) == Seq((1L, "A1"), (2L, "B1")))
    assert(at(2L) == Seq((1L, "A2"), (2L, "B1")))
    assert(at(3L) == Seq((1L, "A2")))
  }

  test("gate corpus: synthetic batch bookkeeping identities hold") {
    val batch = Cdc.changeBatch(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.count()
    val dels = batch.count(_._2 == "delete")
    val ins = batch.count(_._2 == "insert")
    val ups = batch.count(_._2 == "update")
    val applied = Cdc.cdcApplyQ(docs).collect()
    assert(applied.length == nDocs - dels + ins)
    assert(applied.count(_.getString(2) == "updated") == ups)
    assert(applied.count(_.getString(2) == "inserted") == ins)
    // time travel: v1 sees every doc; v3 = v2 minus the deletes
    assert(Cdc.snapshotAt(Cdc.changeLog(docs), 1L).count() == nDocs)
    val v2 = Cdc.snapshotAtQ(docs).count()
    assert(v2 == nDocs)
    assert(Cdc.snapshotAt(Cdc.changeLog(docs), 3L).count() == nDocs - dels)
  }

  test("plan: merge is one key-keyed join carrying fingerprints, not text") {
    val plan = Cdc.cdcApplyQ(docs).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
