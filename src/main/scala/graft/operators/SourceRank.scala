package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SOURCE PAGERANK (round 10) — weighted PageRank over the shared-shingle
  * source graph: nodes are corpus sources, edge (a, b) weighted by the
  * number of distinct shingles the two sources share (the
  * [[SourceOverlap]] affinity, symmetric by construction), ranks the
  * classic damped propagation (Page et al., 1999 — public literature).
  * The curation reading: sources whose content is echoed by many other
  * well-echoed sources — centrality as a quality prior, the graph signal
  * next to [[DedupDegree]]'s local dup counts.
  *
  * The engine statement is ITERATIVE data-flow beyond connected
  * components ([[Dedup.dedupClusters]] is min-label propagation; this is
  * weighted mass propagation): a K-round loop of edge-join + aggregate.
  *
  * Exactness discipline: the recurrence is INTEGER end to end, so both
  * engines replay it bit-for-bit and the operator is sql-oracled — no
  * floating damping, no convergence test (K = [[Iters]] fixed):
  *
  *   r₀(v)    = Scale div n
  *   c_k(u)   = Σ_v (r_k(v)·w(v,u)) div wtot(v)   (floor per edge)
  *   r_{k+1}(u) = (15·Scale) div (100·n) + (85·c_k(u)) div 100
  *
  * Floor losses only LEAK mass (Σr ≤ Scale, spec-pinned), never create
  * it; an isolated source receives exactly the base term. Overflow:
  * r ≤ Scale = 10⁹ and per-edge products r·w stay under 2⁶³ for shared
  * counts up to 10⁹ — beyond any real catalog.
  *
  * Scale shape: the shingle self-join is over DISTINCT (source, shingle)
  * — Σ df² with df ≤ |sources| (catalog-bounded, the SourceOverlap
  * argument) — and everything after lives on catalog-sized frames:
  * edges ≤ |sources|², ranks = |sources| rows broadcast into each of the
  * K unrolled edge joins. The edge frame feeds K consumers and is
  * localCheckpoint'd per the multi-consumer invariant.
  */
object SourceRank {

  /** Rank mass scale (integer units of 1e-9 of total mass). */
  val Scale = 1000000000L

  /** Fixed propagation rounds — a constant, not a convergence test, so
    * the DuckDB twin unrolls the identical K chained CTEs. */
  val Iters = 5

  def sourcePagerank(documents: DataFrame): DataFrame = {
    val ss = SourceOverlap.sourceShingles(documents)
      .withColumnRenamed("shingle", "sh")
      // 3 consumers (nodes + both edge sides) — multi-consumer invariant
      .localCheckpoint()
    val nodes = ss.select("source").distinct().localCheckpoint()
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val edges = ss.select(col("source").as("src"), col("sh"))
      .join(ss.select(col("source").as("dst"), col("sh")), Seq("sh"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .withColumn("wtot", sum("w").over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint() // K consumers (one per unrolled round)
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("source"), expr(s"$Scale div n").as("r"))
    (1 to Iters).foreach { _ =>
      val contrib = edges
        .join(broadcast(ranks.select(col("source").as("src"), col("r"))), Seq("src"))
        .select(col("dst"), expr("(r * w) div wtot").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "source"), Seq("source"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("source"), expr(
          // 15·Scale exceeds INT32 — keep the literal product in BIGINT
          s"(15 * CAST($Scale AS BIGINT)) div (100 * n) + (85 * coalesce(c, CAST(0 AS BIGINT))) div 100")
          .as("r"))
    }
    ranks.select(col("source"), col("r").as("rank"))
  }

  def sourcePagerankQ(documents: DataFrame): DataFrame =
    sourcePagerank(documents).orderBy("source")

  /** DuckDB twin: identical integer recurrence, K rounds unrolled as
    * chained CTEs (grouping is barred from a recursive term, and K is a
    * constant anyway). */
  val sourcePagerankSql: String = {
    val rounds = (1 to Iters).map { k =>
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      s"""r$k AS (
         |  SELECT n.source,
         |         (15 * CAST($Scale AS BIGINT)) // (100 * (SELECT n FROM nn))
         |           + (85 * COALESCE(c.c, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS source, CAST(sum((p.r * e.w) // e.wtot) AS BIGINT) AS c
         |    FROM edges e JOIN $prev p ON p.source = e.src
         |    GROUP BY e.dst
         |  ) c USING (source)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
       |), ss AS (
       |  SELECT DISTINCT source,
       |         unnest(list_distinct([w[i] || ' ' || w[i + 1] for i in range(1, len(w))])) AS sh
       |  FROM toks
       |), nodes AS (
       |  SELECT DISTINCT source FROM ss
       |), nn AS (
       |  SELECT count(*) AS n FROM nodes
       |), ew AS (
       |  SELECT a.source AS src, b.source AS dst, count(*) AS w
       |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source <> b.source
       |  GROUP BY 1, 2
       |), edges AS (
       |  SELECT src, dst, w,
       |         CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS wtot
       |  FROM ew
       |), r0 AS (
       |  SELECT source, $Scale // (SELECT n FROM nn) AS r FROM nodes
       |), $rounds
       |SELECT source, CAST(r AS BIGINT) AS rank
       |FROM r$Iters
       |ORDER BY source""".stripMargin
  }
}
