package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JOIN-SIZE ESTIMATE (round 10) — the planner's cardinality question
  * answered WITHOUT executing the join, completing the sketch family
  * ([[CardinalityReport]] counts one column's distincts, [[ThetaDiff]]
  * does distinct-set algebra, [[FreqSketch]] finds heavy keys; none of
  * them answers "how big would lineitem ⋈ orders be?" — the number that
  * decides broadcast-vs-shuffle and shuffle-partition sizing before any
  * exchange is scheduled; reference analog: the star joins its SQL
  * rollups run unsized, read_gold.py:38-54).
  *
  * Construction (theta-style key sampling, Horvitz–Thompson over the
  * KEY universe): sample join keys whose `md5(key)` first hex digit
  * < [[ThetaHexBound]] — p = bound/16, the SAME key surviving on both
  * sides by construction — aggregate per-key row counts on each side
  * restricted to sampled keys, join the two COUNT frames (|distinct
  * keys|·p rows, never the data), and scale the exact sampled pair mass
  * Σ c_l·c_r by 1/p. Every output is an integer multiple of 16/bound.
  *
  * Scale shape: the sampling predicate is map-side and kills (1 − p) of
  * BOTH fact streams before their count exchanges; the estimator's join
  * carries two per-key count frames. The per-key counts are MERGEABLE
  * (plain sums across shards — the sketch-family property; spec-pinned),
  * so 1000 executors sketch independently. The estimator never shuffles
  * a data row — the thing it is sizing.
  *
  * Error: HT variance ((1−p)/p)·Σ (c_l·c_r)² over the key universe;
  * JoinEstimateSpec recomputes the exact per-key products and pins the
  * gate estimate inside 3σ, and pins bound=16 (p=1) ⇒ estimate == exact.
  */
object JoinEstimate {

  /** p = ThetaHexBound/16 — dense at gate scale (the [[ThetaDiff]]
    * argument: gate key universes are small; a 100 TB deployment narrows
    * p and still sees millions of sampled keys). */
  val ThetaHexBound = 4
  val Scale: Long = 16L / ThetaHexBound

  /** Upper bound as a single comparable char — 'g' at bound 16 (all hex
    * digits pass; "10" would compare lexicographically and break). */
  private def boundChar(bound: Int): String =
    if (bound >= 16) "g" else bound.toHexString

  private def keySample(df: DataFrame, key: String, bound: Int): org.apache.spark.sql.RelationalGroupedDataset =
    df.select(col(key).as("k"))
      .filter(expr(s"substring(md5(CAST(k AS STRING)), 1, 1) < '${boundChar(bound)}'"))
      .groupBy("k")

  /** One-row estimate of |left ⋈ right| on an equi-key, plus scaled
    * side masses over the sampled key stratum. */
  def joinSizeEstimate(left: DataFrame, leftKey: String,
                       right: DataFrame, rightKey: String,
                       bound: Int = ThetaHexBound): DataFrame = {
    val scale = 16L / bound
    val l = keySample(left, leftKey, bound).agg(count(lit(1)).as("c_l"))
    val r = keySample(right, rightKey, bound).agg(count(lit(1)).as("c_r"))
    l.join(r, Seq("k"))
      .agg(
        sum(col("c_l") * col("c_r")).as("s_pairs"),
        count(lit(1)).as("s_keys"),
        sum("c_l").as("s_left"),
        sum("c_r").as("s_right"))
      .select(
        (coalesce(col("s_pairs"), lit(0L)) * scale).as("est_join_rows"),
        (col("s_keys") * scale).as("est_match_keys"),
        (coalesce(col("s_left"), lit(0L)) * scale).as("est_left_rows"),
        (coalesce(col("s_right"), lit(0L)) * scale).as("est_right_rows"))
  }

  /** Registered: size lineitem ⋈ orders on the order key — the suite's
    * one genuine fact-fact shuffle ([[Relational.q3TopK]] et al.). */
  def joinSizeEstimateQ(lineitem: DataFrame, orders: DataFrame): DataFrame =
    joinSizeEstimate(lineitem, "l_orderkey", orders, "o_orderkey")

  /** Oracle: the identical sketch in DuckDB — same sampled keys, same
    * exact count algebra, same integers. */
  val joinSizeEstimateSql: String =
    s"""WITH l AS (
       |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c_l
       |  FROM lineitem
       |  WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) < '$ThetaHexBound'
       |  GROUP BY 1
       |), r AS (
       |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c_r
       |  FROM orders
       |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '$ThetaHexBound'
       |  GROUP BY 1
       |)
       |SELECT CAST(COALESCE(sum(c_l * c_r), 0) * $Scale AS BIGINT) AS est_join_rows,
       |       CAST(count(*) * $Scale AS BIGINT) AS est_match_keys,
       |       CAST(COALESCE(sum(c_l), 0) * $Scale AS BIGINT) AS est_left_rows,
       |       CAST(COALESCE(sum(c_r), 0) * $Scale AS BIGINT) AS est_right_rows
       |FROM l JOIN r USING (k)""".stripMargin
}
