package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REFERENTIAL-INTEGRITY audit (round 8, continuation) — the cross-table
  * data-quality report: for every foreign-key edge of the star schema,
  * how many child rows point at a missing parent. Lakes have no FK
  * enforcement — orphans appear whenever ingest races a dimension load —
  * and every downstream inner join silently DROPS those rows, so the
  * audit quantifies exactly the mass at risk. One row per FK edge:
  * child count, orphan count, match ppm.
  *
  * Cross-engine exactness (§6): counts are BIGINTs; match_ppm =
  * `(n_child − n_orphans) · 10⁶ div n_child` with a greatest-1 guard.
  * Each edge is measured with a LEFT ANTI join on the exact key — no
  * sampling, no bloom approximation (the Bloom pre-filter is a dial the
  * dedup family documents; an AUDIT must be exact).
  *
  * Scale shape: per edge, one key-projected child scan (narrow: one
  * BIGINT column reaches the shuffle) anti-joined against the parent
  * key set — parent dims broadcast when small (AQE decides; orders as
  * parent of lineitem stays a shuffle join at scale). Edges union into
  * a catalog-sized report. Column pruning pushes the single-key
  * ReadSchema into every scan (spec-pinned).
  */
object RefIntegrity {

  /** One audited edge: child frame + key, parent frame + key. */
  private def edge(name: String, child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).as("k"))
    val orphans = ck.join(parent.select(col(parentKey).as("k")),
      Seq("k"), "left_anti")
    ck.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
        expr("(n_child - n_orphans) * 1000000 div greatest(n_child, 1)")
          .as("match_ppm"))
  }

  def refIntegrity(lineitem: DataFrame, orders: DataFrame,
                   customer: DataFrame, part: DataFrame,
                   supplier: DataFrame, nation: DataFrame): DataFrame = {
    val edges = Seq(
      edge("customer->nation", customer, "c_nationkey", nation, "n_nationkey"),
      edge("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
      edge("lineitem->part", lineitem, "l_partkey", part, "p_partkey"),
      edge("lineitem->supplier", lineitem, "l_suppkey", supplier, "s_suppkey"),
      edge("orders->customer", orders, "o_custkey", customer, "c_custkey"),
      edge("supplier->nation", supplier, "s_nationkey", nation, "n_nationkey"))
    edges.reduce(_.unionAll(_)).orderBy("fk_edge")
  }

  /** Oracle arms use NOT EXISTS (true anti semantics — a LEFT JOIN count
    * would multiply child rows under a non-unique parent key; an anti
    * join never does, and NULL child keys orphan on both engines). */
  val refIntegritySql: String = {
    def arm(name: String, child: String, ck: String,
            parent: String, pk: String): String =
      s"""SELECT '$name' AS fk_edge, n_child, n_orphans,
         |       (n_child - n_orphans) * 1000000 // greatest(n_child, 1) AS match_ppm
         |FROM (SELECT (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
         |             (SELECT CAST(count(*) AS BIGINT) FROM $child c
         |              WHERE NOT EXISTS (SELECT 1 FROM $parent p
         |                                WHERE p.$pk = c.$ck)) AS n_orphans)""".stripMargin
    Seq(
      arm("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      arm("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      arm("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      arm("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      arm("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      arm("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
  }
}
