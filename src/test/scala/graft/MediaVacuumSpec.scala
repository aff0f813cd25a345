package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cdc, MediaSniff, VacuumPlan}

/** Media sniffer + vacuum plan: fixture-exact classification (traps
  * included), decoder-agreement, planted retention arithmetic and a
  * gate recount over the change log.
  */
class MediaVacuumSpec extends AnyFunSuite {
  import SparkTestSession._

  test("media_sniff: every fixture classifies by magic, traps are unknown") {
    val out = MediaSniff.mediaSniffQ(spark).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out.size == 21)
    def ext(f: String) = f.substring(f.lastIndexOf('.') + 1)
    out.foreach { case (f, (cls, cont)) =>
      ext(f) match {
        case "png" => assert((cls, cont) == (("image", "png")), f)
        case "gif" => assert((cls, cont) == (("image", "gif")), f)
        case "bmp" => assert((cls, cont) == (("image", "bmp")), f)
        case "jpg" => assert((cls, cont) == (("image", "jpeg")), f)
        case "wav" => assert((cls, cont) == (("audio", "wav")), f)
        case "mp4" => assert((cls, cont) == (("video", "mp4")), f)
        case "bin" => assert((cls, cont) == (("unknown", "unknown")), f)
      }
    }
  }

  test("vacuum_plan planted: latest-per-key + horizon retention, tombstones kept") {
    import spark.implicits._
    // A: v1,v2,v3 → v1,v2 vacuumable; B: only v1 (old but latest → kept);
    // C: insert v1 then delete v3 → tombstone kept, v1 vacuumable
    val log = Seq(
      (1L, 1L, "insert"), (1L, 2L, "update"), (1L, 3L, "update"),
      (2L, 1L, "insert"),
      (3L, 1L, "insert"), (3L, 3L, "delete"))
      .toDF("doc_id", "version", "op")
    val out = VacuumPlan.vacuumPlan(log).orderBy("version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 2L, 0L),   // A.v1, C.v1 vacuum; B.v1 kept (latest)
      (2L, 1L, 0L, 1L, 0L),   // A.v2 superseded
      (3L, 2L, 2L, 0L, 1L)))  // A.v3 + C's tombstone (counted)
  }

  test("vacuum_plan gate: recount from the change log") {
    val log = Cdc.changeLog(Tables.documents(spark, sf))
    val rows = log.select("doc_id", "version", "op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val vMax = rows.map(_._2).max
    val latest = rows.groupBy(_._1).map { case (k, es) => (k, es.map(_._2).max) }.toSet
    val expected = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, es) =>
      val ret = es.filter(e => latest((e._1, e._2)) || e._2 > vMax - VacuumPlan.RetainVersions)
      (v, es.length.toLong, ret.length.toLong, (es.length - ret.length).toLong,
        ret.count(_._3 == "delete").toLong)
    }
    val out = VacuumPlan.vacuumPlanQ(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == expected)
    // retention soundness: everything snapshot_at(v_max) needs is retained
    assert(out.map(_._3).sum >= latest.size)
  }
}
