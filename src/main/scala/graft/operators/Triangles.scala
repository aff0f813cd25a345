package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TRIANGLE CENSUS of the near-dup pair graph (round 10) — the graph
  * family's second global statistic after [[SourceRank]]'s PageRank:
  * [[DedupDegree]] reports how many neighbors each doc has; this
  * reports how CLIQUEY the duplication topology is — triangles + global
  * clustering coefficient (3·T / wedges). High clustering means dup
  * clusters are dense blobs ([[Dedup.dedupClusters]] components collapse
  * many pairs each); low clustering with high degree means long chains —
  * transitive-closure blowup risk for keep-best selection. Same
  * operator-dial role as dedup_degree, one moment higher.
  *
  * Engine plan is the distributed-graph classic (node-iterator with
  * DEGREE-ORDERED ORIENTATION, Suri–Vassilvitskii / Cohen's MapReduce
  * scheme, public literature): orient every edge from its
  * (degree, id)-smaller endpoint to the larger, so each triangle is
  * counted EXACTLY once and every node's out-degree is O(√m) — the
  * wedge self-join is Σ outdeg² bounded, never Σ deg² on the hubs.
  * Two hash joins over the edge list; no node ever enumerates a hub's
  * full neighborhood. The ORACLE counts the same triangles with the
  * naive ordered 3-way self-join — agreement proves the orientation
  * identity. Wedge count comes from the degree frame alone.
  *
  * §6: all counts BIGINT; clustering as integer ppm
  * (3·T·10⁶ div max(W, 1)); deg·(deg−1) is even so the /2 is exact.
  * The pair frame is localCheckpoint'd (three consumers: degree frame,
  * orientation join, closing-edge probe — the multi-consumer invariant).
  */
object Triangles {

  /** One-row census over a canonical (id1 < id2) undirected edge list. */
  def triangleStats(pairsIn: DataFrame): DataFrame = {
    val pairs = pairsIn.select("id1", "id2").localCheckpoint()
    val deg = pairs.select(col("id1").as("n"))
      .unionAll(pairs.select(col("id2").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .localCheckpoint() // consumed by the wedge fact + two orientation joins
    val wedges = deg.agg(
      coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges"))
    val oriented = pairs
      .join(deg.select(col("n").as("id1"), col("deg").as("deg1")), Seq("id1"))
      .join(deg.select(col("n").as("id2"), col("deg").as("deg2")), Seq("id2"))
      .select(
        when(struct(col("deg1").as("d"), col("id1").as("i")) <
          struct(col("deg2").as("d"), col("id2").as("i")),
          col("id1")).otherwise(col("id2")).as("src"),
        when(struct(col("deg1").as("d"), col("id1").as("i")) <
          struct(col("deg2").as("d"), col("id2").as("i")),
          struct(col("deg2").as("d"), col("id2").as("i")))
          .otherwise(struct(col("deg1").as("d"), col("id1").as("i")))
          .as("dst_rank"))
      .select(col("src"), col("dst_rank"), col("dst_rank.i").as("dst"))
      .localCheckpoint() // wedge-join both sides + closing-edge probe
    val wedgeCands = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst_rank") < col("e2.dst_rank"))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    val tri = wedgeCands
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val edges = pairs.agg(count(lit(1)).as("n_edges"))
    edges.crossJoin(broadcast(tri)).crossJoin(broadcast(wedges))
      .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
        expr("3 * n_triangles * 1000000 div greatest(n_wedges, 1)")
          .as("clustering_ppm"))
  }

  /** Registered over the verified near-dup pair set ([[DedupDegree]]'s
    * input contract — oracle nests Lsh.exactPairCtes, one-text rule). */
  def dedupTrianglesQ(documents: DataFrame): DataFrame =
    triangleStats(Lsh.minhashLshPairs(documents))

  val dedupTrianglesSql: String =
    s"""WITH ${Lsh.exactPairCtes}, p AS (
       |  SELECT id1, id2 FROM j WHERE jaccard >= ${Dedup.JaccardThreshold}
       |), deg AS (
       |  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT id1 AS n FROM p UNION ALL SELECT id2 FROM p
       |  ) GROUP BY 1
       |), w AS (
       |  SELECT CAST(COALESCE(sum(deg * (deg - 1) // 2), 0) AS BIGINT) AS n_wedges
       |  FROM deg
       |), t AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
       |  FROM p e1
       |  JOIN p e2 ON e2.id1 = e1.id1 AND e2.id2 > e1.id2
       |  JOIN p e3 ON e3.id1 = e1.id2 AND e3.id2 = e2.id2
       |), e AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_edges FROM p
       |)
       |SELECT n_edges, n_triangles, n_wedges,
       |       3 * n_triangles * 1000000 // greatest(n_wedges, 1) AS clustering_ppm
       |FROM e CROSS JOIN t CROSS JOIN w""".stripMargin
}
