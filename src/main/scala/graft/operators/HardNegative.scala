package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.r

/** Hard-negative mining over the embedding corpus — the contrastive-
  * training data op: for each query vector, the top-k most-similar
  * vectors whose LABEL DIFFERS (reference similarity surface:
  * test_train.py:108-113's cosine gallery scoring; the cross-label
  * restriction is the standard triplet/contrastive mining step layered
  * on it). "Hardest" negatives =
  * highest-cosine cross-label neighbors; these are the pairs a
  * contrastive objective learns most from.
  *
  * Plan shape: identical to [[Similarity.knnCosineBrute]] — the query set
  * (vec_id % [[Similarity.QueryMod]] = 0) is a small fraction of the
  * corpus and is BROADCAST against ONE linear corpus scan (a broadcast
  * nested-loop by necessity: the join predicate is the label
  * INEQUALITY — the documented broadcast-fact class). |Q| × corpus dot
  * products, one narrow per-query window for the top-k. At 100 TB the
  * LSH/IVF candidate generation (Lsh.scala, Ivf.scala) slots in front
  * exactly as it does for knn — this exact form is the oracle path.
  *
  * Oracle parity: same left-assoc double fold as the knn twin
  * (bit-identical cosines); rank window total via (cos DESC, vec_id).
  * NULL labels (none in this table) would drop on both engines under the
  * same `<>` semantics.
  */
object HardNegative {

  val K = 3

  def hardNegatives(embeddings: DataFrame, k: Int = K): DataFrame = {
    val e = Similarity.withNorm(embeddings)
    val q = e.filter(col("vec_id") % Similarity.QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"),
        col("vd").as("qv"), col("norm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    e.select(col("vec_id"), col("label"), col("vd"), col("norm"))
      .join(broadcast(q), col("label") =!= col("query_label"))
      .withColumn("cos", expr(s"${Similarity.DotF} / (norm * qn)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("vec_id").as("neighbor_id"),
        col("label").as("neighbor_label"), col("rank"), col("cos"))
  }

  def hardNegativesQ(embeddings: DataFrame): DataFrame =
    hardNegatives(embeddings)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("rank"), r("cos", 4))
      .orderBy("query_id", "rank")

  val hardNegativesSql: String =
    s"""${Similarity.VecCte}, scored AS (
       |  SELECT q.vec_id AS query_id, q.label AS query_label,
       |         a.vec_id AS neighbor_id, a.label AS neighbor_label,
       |         ${Similarity.DotSqlF} / (a.norm * q.norm) AS cos
       |  FROM n a JOIN n q
       |    ON q.vec_id % ${Similarity.QueryMod} = 0 AND a.label <> q.label
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, query_label, neighbor_id, neighbor_label, rank,
       |       ${Parity.rsql("cos", 4, "cos")}
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
}
