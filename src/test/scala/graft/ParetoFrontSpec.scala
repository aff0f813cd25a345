package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ParetoFront, TextOps}

/** pareto_front — planted-point skyline semantics (duplicates kept,
  * same-q strict dominance, NULL exclusion), definitional equality with a
  * brute-force dominance join on the gate corpus, frontier completeness,
  * and the one-exchange plan pin. */
class ParetoFrontSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted points: duplicates survive, same-q and higher-q dominance prune") {
    // (q, t): front = {(5,1), (4,4)×2, (3,5)}; (4,2) out by same-q peer
    // (4,4); (3,3) out by higher-q (4,4); (5,1) stays (nothing has q>5);
    // (2,5) out by (3,5) (q strictly greater, t equal).
    val pts = Seq(
      (1L, 5L, 1L), (2L, 4L, 4L), (3L, 4L, 4L), (4L, 4L, 2L),
      (5L, 3L, 5L), (6L, 3L, 3L), (7L, 2L, 5L))
      .toDF("doc_id", "qs4", "n_tokens")
      .withColumn("source", lit("s"))
    val got = ParetoFront.skyline(pts).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 5L), s"front drifted: $got")
  }

  test("gate corpus: window skyline equals the definitional dominance join") {
    val scored = TextOps.textQuality(docs)
      .withColumn("qs4", expr("CAST(round(quality_score * 10000.0) AS BIGINT)"))
      .select(col("source"), col("doc_id"), col("qs4"),
        col("n_tokens").cast("long").as("n_tokens"))
      .filter(col("qs4").isNotNull && col("n_tokens").isNotNull)
      .localCheckpoint()
    val dominated = scored.as("a").join(scored.as("b"),
      col("a.source") === col("b.source") &&
        col("b.qs4") >= col("a.qs4") && col("b.n_tokens") >= col("a.n_tokens") &&
        (col("b.qs4") > col("a.qs4") || col("b.n_tokens") > col("a.n_tokens")),
      "left_semi")
    val brute = scored.join(dominated.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = ParetoFront.paretoFront(docs).select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "empty frontier at gate SF — vacuous")
    assert(got == brute, s"window form diverges: ${got.size} vs ${brute.size}")
    // completeness: every excluded doc is dominated by some FRONT doc
    // (dominance is transitive, so a frontier witness always exists)
    val front = ParetoFront.paretoFront(docs).localCheckpoint()
    val excluded = scored.join(front.select("doc_id"), Seq("doc_id"), "left_anti")
    val witnessed = excluded.as("a").join(front.as("b"),
      col("a.source") === col("b.source") &&
        col("b.qs4") >= col("a.qs4") && col("b.n_tokens") >= col("a.n_tokens") &&
        (col("b.qs4") > col("a.qs4") || col("b.n_tokens") > col("a.n_tokens")),
      "left_semi").count()
    assert(witnessed == excluded.count(), "an excluded doc has no frontier dominator")
  }

  test("plan: both windows share one exchange and one sort; no join anywhere") {
    val plan = ParetoFront.paretoFront(docs).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), "skyline must not plan a join")
  }
}
