package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EMBEDDING PRINCIPAL DIRECTION (round 10) — the corpus's top principal
  * axis by POWER ITERATION (Mises–Pollaczek-Geiringer, public numerics):
  * v ← Σ_x x·(xᵀv), renormalized each round — the direction that carries
  * the most embedding mass. The curation readings: the drift axis
  * ([[EmbeddingDrift]] measures shift, this names the direction), the
  * first basis vector a PQ/int8 quantizer wants, and the classic
  * "dominant topic" readout.
  *
  * The engine statement is the ITERATIVE fixed point over VECTORS
  * (pagerank's sibling with dims for nodes): K = [[Rounds]] fixed rounds,
  * each one edge-like pass — dots per vector, then per-dim contributions
  * — over a posexploded (vec_id, dim, x) frame that is checkpointed ONCE
  * and reused by every round (2K consumers).
  *
  * Exactness: components quantize to integer milli-units up front
  * (`CAST(x AS DOUBLE)` first — the float→double cast both engines share,
  * the EmbeddingQuantize discipline), the start vector is e₁·1000, every
  * dot/contribution/sum is exact BIGINT arithmetic (order-free), and the
  * per-round renormalization is integer: v' = sign(u)·(|u|·1000 div
  * max|u|) — the SIGNED division factored as sign·(|n| div d) because
  * Spark's `div` truncates toward zero while DuckDB's `//` floors (the
  * lexicon_score divergence, avoided the same way). Both engines replay
  * the identical recurrence bit for bit; the DuckDB twin unrolls the K
  * rounds as chained CTEs. Sign is pinned by the fixed start (power
  * iteration's sign ambiguity never arises — same start, same floors).
  *
  * Scale: per round one vec_id-keyed shuffle (dots) and one dim-keyed
  * aggregation (64 keys, map-side combinable); v rides as a 64-row
  * broadcast. Overflow headroom: milli-quantized components keep per-row
  * products ≤ ~10¹¹ and corpus sums exact to ~10⁷ vectors per unit
  * component mass — beyond the gate by orders; at 10⁹-vector scale the
  * quantization drops a decade (the ThetaDiff-style dial). m = 0 (a
  * corpus orthogonal to the start) holds v instead of dividing by zero.
  */
object EmbeddingPrincipal {

  /** Fixed power-iteration rounds (a constant so the oracle unrolls). */
  val Rounds = 6

  /** Renormalization scale: max |component| after each round. */
  val VScale = 1000L

  def embeddingPrincipal(embeddings: DataFrame): DataFrame = {
    // (vec_id, dim, x) in integer milli-units; one frame, 2K consumers
    val ex = embeddings
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 1000.0) AS BIGINT))"))
        .as(Seq("dim", "x")))
      .localCheckpoint()
    val dims = ex.select("dim").distinct().localCheckpoint()
    var v = dims.select(col("dim"),
      when(col("dim") === 0, VScale).otherwise(0L).as("v"))
    (1 to Rounds).foreach { _ =>
      val dots = ex.join(broadcast(v), Seq("dim"))
        .groupBy("vec_id").agg(sum(expr("x * v")).as("dot"))
      val u = ex.join(dots, Seq("vec_id"))
        .groupBy("dim").agg(sum(expr("x * dot")).as("u"))
        // 2 consumers per round (the v rebuild AND the max fact): without
        // this 64-row checkpoint the round-k plan contains round k-1's
        // TWICE and the lineage doubles per round — measured 2899 plan
        // nodes at K=6 (the multi-consumer invariant, iterated)
        .localCheckpoint()
      val m = u.agg(max(abs(col("u"))).as("m"))
      v = dims.join(u, Seq("dim"), "left")
        .crossJoin(broadcast(m))
        .select(col("dim"), expr(
          s"""CASE WHEN coalesce(m, CAST(0 AS BIGINT)) = 0
             |     THEN CASE WHEN dim = 0 THEN CAST($VScale AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |     ELSE CAST(sign(coalesce(u, CAST(0 AS BIGINT))) AS BIGINT)
             |          * ((abs(coalesce(u, CAST(0 AS BIGINT))) * $VScale) div m)
             |END""".stripMargin).as("v"))
    }
    v.select(col("dim").cast("int").as("dim"), col("v").as("loading"))
  }

  def embeddingPrincipalQ(embeddings: DataFrame): DataFrame =
    embeddingPrincipal(embeddings).orderBy("dim")

  /** DuckDB twin: identical integer recurrence, rounds unrolled; v lives
    * as one 64-element list per round, the per-dim aggregation explodes
    * via a lateral range unnest. dim is 0-based on both sides. */
  val embeddingPrincipalSql: String = {
    val rounds = (1 to Rounds).map { k =>
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      s"""dots$k AS (
         |  SELECT q.vec_id, q.qm,
         |         CAST(list_sum([q.qm[i] * p.v[i] for i in range(1, len(q.qm) + 1)]) AS BIGINT) AS dot
         |  FROM q, $prev p
         |), u$k AS (
         |  SELECT i - 1 AS dim, CAST(sum(qm[i] * dot) AS BIGINT) AS u
         |  FROM dots$k, UNNEST(range(1, len(qm) + 1)) AS t(i)
         |  GROUP BY i
         |), m$k AS (
         |  SELECT CAST(max(abs(u)) AS BIGINT) AS m FROM u$k
         |), v$k AS (
         |  SELECT list(CASE WHEN m = 0
         |                   THEN CASE WHEN dim = 0 THEN CAST($VScale AS BIGINT) ELSE 0 END
         |                   ELSE CAST(sign(u) AS BIGINT) * ((abs(u) * $VScale) // m)
         |              END ORDER BY dim) AS v
         |  FROM u$k, m$k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 1000.0) AS BIGINT)) AS qm
       |  FROM embeddings
       |), d AS (
       |  SELECT max(len(qm)) AS nd FROM q
       |), v0 AS (
       |  SELECT [CASE WHEN i = 1 THEN CAST($VScale AS BIGINT) ELSE 0 END
       |          for i in range(1, nd + 1)] AS v
       |  FROM d WHERE nd IS NOT NULL
       |), $rounds
       |SELECT CAST(t.i - 1 AS INT) AS dim, v[t.i] AS loading
       |FROM v$Rounds, UNNEST(range(1, len(v) + 1)) AS t(i)
       |ORDER BY dim""".stripMargin
  }
}
