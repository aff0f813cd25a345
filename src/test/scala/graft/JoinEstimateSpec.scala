package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinEstimate

/** The join-cardinality sketch's contract: exact at p=1 (the product
  * algebra itself), measured 3σ accuracy vs the real join at gate scale
  * (HT variance recomputed exactly in Scala), and totality on empty /
  * disjoint inputs. */
class JoinEstimateSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("p=1 (bound 16): estimate equals the exact join size, with multiplicities") {
    val l = Seq(1L, 1L, 1L, 2L, 2L, 3L, 9L).toDF("k1")
    val r = Seq(1L, 1L, 2L, 3L, 3L, 3L, 8L).toDF("k2")
    // exact: 3*2 + 2*1 + 1*3 = 11 over matched keys {1,2,3}
    val row = JoinEstimate.joinSizeEstimate(l, "k1", r, "k2", bound = 16).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      (11L, 3L, 6L, 6L), s"p=1 sketch: $row")
  }

  test("empty and disjoint inputs: total, zero estimates") {
    val empty = Seq.empty[Long].toDF("k1")
    val r = Seq(1L, 2L).toDF("k2")
    val e1 = JoinEstimate.joinSizeEstimate(empty, "k1", r, "k2", bound = 16).collect()(0)
    assert((0 to 3).map(e1.getLong) == Seq(0L, 0L, 0L, 0L), s"empty left: $e1")
    val disj = Seq(7L, 9L).toDF("k1")
    val e2 = JoinEstimate.joinSizeEstimate(disj, "k1", r, "k2", bound = 16).collect()(0)
    assert(e2.getLong(0) == 0L && e2.getLong(1) == 0L, s"disjoint: $e2")
  }

  test("gate accuracy: estimate within 3σ (exact HT variance) of the real join size") {
    val li = Tables.lineitem(spark, sf)
    val od = Tables.orders(spark, sf)
    val perKey = li.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("c_l"))
      .join(od.groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("c_r")), Seq("k"))
      .select((col("c_l") * col("c_r")).as("prod"))
    val stats = perKey.agg(sum("prod"), sum(col("prod") * col("prod"))).collect()(0)
    val exact = stats.getLong(0)
    val p = 1.0 / JoinEstimate.Scale
    val sd = math.sqrt(stats.getLong(1).toDouble * (1 - p) / p)
    val est = JoinEstimate.joinSizeEstimateQ(li, od).collect()(0).getLong(0)
    assert(math.abs(est - exact) <= 3 * sd + JoinEstimate.Scale,
      f"est $est vs exact $exact exceeds 3σ=${3 * sd}%.0f")
  }

  test("chunked arrival: the sketch is insensitive to input partitioning (mergeable counts)") {
    val li = Tables.lineitem(spark, sf)
    val od = Tables.orders(spark, sf)
    val whole = JoinEstimate.joinSizeEstimateQ(li, od).collect()(0)
    val chunked = JoinEstimate.joinSizeEstimateQ(li.repartition(7), od.repartition(3))
      .collect()(0)
    assert(whole == chunked, s"partitioning changed the sketch: $whole vs $chunked")
  }
}
