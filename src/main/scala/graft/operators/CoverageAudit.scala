package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PARENT-COVERAGE audit (round 8, continuation 5) — [[RefIntegrity]]'s
  * mirror direction: per FK edge, how many PARENT rows no child ever
  * references (childless customers, never-ordered parts, idle
  * suppliers). Orphan children are corruption; childless parents are
  * usually legitimate — but their RATE is the fact behind "why did the
  * dim-filter join drop 40% of my dimension pushdown benefit", what a
  * mixture/sampling plan must know before stratifying on a dimension,
  * and the retention signal on its own (a customer with zero orders IS
  * the churn cohort). One row per edge: parent count, childless count,
  * coverage ppm.
  *
  * Cross-engine exactness (SURVEY §6): exact BIGINT counts via LEFT
  * ANTI from the parent side against the DISTINCT child key set;
  * coverage_ppm integer with the greatest-1 guard. Oracle uses NOT
  * EXISTS ([[RefIntegrity]]'s argument — join-counting would multiply).
  *
  * Scale shape: per edge, the child key set collapses to DISTINCT keys
  * BEFORE the anti join (dedup-early: |children| → |distinct keys|, the
  * shuffle carries one BIGINT column), parents are dim-sized. Edges
  * union into a catalog-sized report; the 1-row count facts ride the
  * documented broadcast-fact nested loops.
  */
object CoverageAudit {

  private def edge(name: String, parent: DataFrame, parentKey: String,
                   child: DataFrame, childKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("k"))
    val childless = pk.join(child.select(col(childKey).as("k")).distinct(),
      Seq("k"), "left_anti")
    pk.agg(count(lit(1)).as("n_parents"))
      .crossJoin(childless.agg(count(lit(1)).as("n_childless")))
      .select(lit(name).as("fk_edge"), col("n_parents"), col("n_childless"),
        expr("(n_parents - n_childless) * 1000000 div greatest(n_parents, 1)")
          .as("coverage_ppm"))
  }

  def coverageAudit(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, part: DataFrame,
                    supplier: DataFrame, nation: DataFrame): DataFrame = {
    val edges = Seq(
      edge("customer<-orders", customer, "c_custkey", orders, "o_custkey"),
      edge("nation<-customer", nation, "n_nationkey", customer, "c_nationkey"),
      edge("nation<-supplier", nation, "n_nationkey", supplier, "s_nationkey"),
      edge("orders<-lineitem", orders, "o_orderkey", lineitem, "l_orderkey"),
      edge("part<-lineitem", part, "p_partkey", lineitem, "l_partkey"),
      edge("supplier<-lineitem", supplier, "s_suppkey", lineitem, "l_suppkey"))
    edges.reduce(_.unionAll(_)).orderBy("fk_edge")
  }

  val coverageAuditSql: String = {
    def arm(name: String, parent: String, pk: String,
            child: String, ck: String): String =
      s"""SELECT '$name' AS fk_edge, n_parents, n_childless,
         |       (n_parents - n_childless) * 1000000 // greatest(n_parents, 1) AS coverage_ppm
         |FROM (SELECT (SELECT CAST(count(*) AS BIGINT) FROM $parent) AS n_parents,
         |             (SELECT CAST(count(*) AS BIGINT) FROM $parent p
         |              WHERE NOT EXISTS (SELECT 1 FROM $child c
         |                                WHERE c.$ck = p.$pk)) AS n_childless)""".stripMargin
    Seq(
      arm("customer<-orders", "customer", "c_custkey", "orders", "o_custkey"),
      arm("nation<-customer", "nation", "n_nationkey", "customer", "c_nationkey"),
      arm("nation<-supplier", "nation", "n_nationkey", "supplier", "s_nationkey"),
      arm("orders<-lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
      arm("part<-lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
      arm("supplier<-lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
  }
}
