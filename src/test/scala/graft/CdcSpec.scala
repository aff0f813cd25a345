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

  test("planted: scd2 intervals close on update AND on delete") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "insert", Some("A1")), (1L, 2L, "update", Some("A2")),
      (2L, 1L, "insert", Some("B1")), (2L, 3L, "delete", None),
      (3L, 1L, "insert", Some("C1")))
      .toDF("doc_id", "version", "op", "fp")
    val got = Cdc.scd2Build(log).orderBy("doc_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, "A1", 1L, Some(2L), false),   // closed by the update
      (1L, "A2", 2L, None, true),
      (2L, "B1", 1L, Some(3L), false),   // closed by the delete, no successor
      (3L, "C1", 1L, None, true)))
  }

  test("gate corpus: scd2 tiles version space and reproduces every snapshot") {
    val log = Cdc.changeLog(docs).localCheckpoint()
    val iv = Cdc.scd2Build(log).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // no overlaps/gaps per key: intervals sorted by valid_from chain
    // valid_to == next valid_from (or the delete version / open end)
    iv.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array((_, _, _, Some(to)), (_, _, from, _)) =>
          assert(to == from, s"doc $id: gap/overlap at $to vs $from")
        case _ => ()
      }
      assert(sorted.init.forall(_._4.nonEmpty), s"doc $id: open non-final interval")
    }
    // exactly one current row per live key, none for deleted keys
    val current = iv.filter(_._4.isEmpty).map(_._1)
    assert(current.distinct.length == current.length)
    val deleted = log.filter(col("op") === "delete").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(current.forall(id => !deleted.contains(id)))
    // interval containment reproduces snapshotAt at every version
    (1L to 3L).foreach { v =>
      val fromIv = iv.filter(r => r._3 <= v && r._4.forall(_ > v))
        .map(r => (r._1, r._2)).sortBy(_._1).toSeq
      val snap = Cdc.snapshotAt(log, v).collect()
        .map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
      assert(fromIv == snap, s"version $v: scd2 view diverges from snapshotAt")
    }
  }

  test("plan: merge is one key-keyed join carrying fingerprints, not text") {
    val plan = Cdc.cdcApplyQ(docs).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
