package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Attribution, KnnPurity, Similarity}

/** kNN label purity (cross-derived from the brute neighbor frame) and
  * last-touch attribution (planted credit algebra + gate recount).
  */
class KnnPurityAttributionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gate corpus: purity rollup cross-derived from knn_cosine_brute") {
    val emb = Tables.embeddings(spark, sf)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val knn = Similarity.knnCosineBrute(emb)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = knn.groupBy(k => labels(k._1)).toSeq.map { case (ql, rows) =>
      val matches = rows.count { case (_, n) => labels(n) == ql }
      (ql, rows.map(_._1).distinct.size.toLong, rows.size.toLong, matches.toLong,
        matches.toLong * 1000000L / rows.size)
    }.sortBy(_._1)
    val got = KnnPurity.knnLabelPurityQ(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  private def ev(rows: Seq[(Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, tSec, et, v), i) =>
      (i.toLong, new Timestamp(tSec * 1000L), u, et, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("planted attribution: last touch wins, same-instant touch counts, _none bucket") {
    val rows = Seq[(Long, Long, String, Double)](
      // u1: view@0, click@10, purchase@20 → click credited (2.00)
      (1L, 0L, "view", 0.0), (1L, 10L, "click", 0.0), (1L, 20L, "purchase", 2.0),
      // u2: purchase@5 with NO touch → _none (3.00); then view@6, purchase@7 → view
      (2L, 5L, "purchase", 3.0), (2L, 6L, "view", 0.0), (2L, 7L, "purchase", 4.0),
      // u3: view at the SAME instant as the purchase → view credited
      (3L, 9L, "view", 0.0), (3L, 9L, "purchase", 5.0),
      // error events must be invisible to attribution
      (3L, 8L, "error", 99.0))
    val out = Attribution.attributionLastTouchQ(ev(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("click") == ((1L, 200L, 250000L)), s"click ${out.get("click")}")
    assert(out("view") == ((2L, 900L, 500000L)), s"view ${out.get("view")}")
    assert(out("_none") == ((1L, 300L, 250000L)), s"_none ${out.get("_none")}")
    assert(out.keySet == Set("click", "view", "_none"))
  }

  test("gate corpus: attribution recount") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS t_us",
        "CAST(round(value * 100.0) AS BIGINT) AS cents", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .filter(e => Set("view", "click", "purchase")(e._5))
    val credited = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, if (e._5 == "purchase") 1 else 0, e._2))
      var lastTouch: String = "_none"
      sorted.flatMap { e =>
        if (e._5 == "purchase") Some((lastTouch, e._4))
        else { lastTouch = e._5; None }
      }
    }
    val total = credited.size.toLong
    val expected = credited.groupBy(_._1).map { case (ch, v) =>
      (ch, v.size.toLong, v.map(_._2).sum, v.size.toLong * 1000000L / total)
    }.toSeq.sortBy(_._1)
    val got = Attribution.attributionLastTouchQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }
}
