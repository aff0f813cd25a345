package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

/** The orientation identity on planted graphs: exact triangle / wedge /
  * clustering values where they can be counted by hand — K4 (every
  * wedge closes), a path (no triangle), a hub star plus one closing
  * edge (exactly one triangle on a high-degree node), empty input. */
class TrianglesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def stats(pairs: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val r = Triangles.triangleStats(pairs.toDF("id1", "id2")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("K4: 6 edges, 4 triangles, 12 wedges, clustering 1.0") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(stats(k4.toSeq) == (6L, 4L, 12L, 1000000L))
  }

  test("path graph: wedges but zero triangles") {
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (3L, 0L, 2L, 0L))
  }

  test("hub star + one closing edge: exactly one triangle despite the hub") {
    // hub 1 connected to 2..6; extra edge (2,3) closes one triangle.
    val star = (2L to 6L).map(n => (1L, n)) :+ (2L, 3L)
    // degrees: hub 5, nodes 2,3 -> 2, others 1. wedges = C(5,2)+1+1 = 12;
    // clustering = 3·1·10⁶ div 12 = 250000
    assert(stats(star) == (6L, 1L, 12L, 250000L))
  }

  test("empty edge list: total, all zeros") {
    assert(stats(Seq.empty) == (0L, 0L, 0L, 0L))
  }
}
