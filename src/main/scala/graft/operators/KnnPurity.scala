package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** kNN LABEL PURITY (round 8, continuation) — the embedding-quality
  * eval: for each query vector, how many of its exact top-k cosine
  * neighbors share its label, rolled up per label. High purity = the
  * embedding space respects the labeling (retrieval/clustering will
  * work); a low-purity label names WHERE the space is confused — the
  * readout that gates an embedding model swap before [[Similarity]]'s
  * dedup/ANN operators are pointed at its vectors.
  *
  * Cross-engine exactness (§6): neighbor sets come from
  * [[Similarity.knnCosineBrute]] — bit-identical cosines by the shared
  * left-assoc fold, deterministic vec_id tie-break — and purity is
  * integer ppm over exact match counts. The oracle NESTS the brute-knn
  * SQL verbatim (shared-CTE convention) so the neighbor contract cannot
  * drift.
  *
  * Scale shape: everything downstream of the brute scan is
  * queries-sized (|Q|·k rows); the query-label join is |Q|-keyed. The
  * corpus-scale cost IS the brute scan, already documented on C31 — at
  * 100 TB the same rollup runs unchanged over [[Lsh.knnCosineLsh]]'s
  * candidates (rerank bit-identical at the spec-pinned probe width).
  */
object KnnPurity {

  def knnLabelPurity(embeddings: DataFrame): DataFrame = {
    val knn = Similarity.knnCosineBrute(embeddings)
    val qLabels = embeddings
      .filter(col("vec_id") % Similarity.QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"))
    knn.join(qLabels, Seq("query_id"))
      .withColumn("m", expr("CASE WHEN label = query_label THEN 1 ELSE 0 END"))
      .groupBy("query_label")
      .agg(countDistinct("query_id").as("n_queries"),
        count(lit(1)).as("n_neighbors"),
        sum("m").as("n_matches"))
      .withColumn("purity_ppm", expr("n_matches * 1000000 div n_neighbors"))
      .select(col("query_label").as("label"), col("n_queries"),
        col("n_neighbors"), col("n_matches"), col("purity_ppm"))
  }

  def knnLabelPurityQ(embeddings: DataFrame): DataFrame =
    knnLabelPurity(embeddings).orderBy("label")

  val knnLabelPuritySql: String = {
    val knnCte = Similarity.knnCosineBruteSql.replace("ORDER BY query_id, rank", "")
    s"""WITH knn AS (
       |  SELECT * FROM ($knnCte)
       |), q AS (
       |  SELECT vec_id AS query_id, label AS query_label FROM embeddings
       |  WHERE vec_id % ${Similarity.QueryMod} = 0
       |), j AS (
       |  SELECT k.query_id, q.query_label,
       |         CASE WHEN k.label = q.query_label THEN 1 ELSE 0 END AS m
       |  FROM knn k JOIN q ON k.query_id = q.query_id
       |)
       |SELECT query_label AS label,
       |       CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
       |       CAST(count(*) AS BIGINT) AS n_neighbors,
       |       CAST(sum(m) AS BIGINT) AS n_matches,
       |       CAST(sum(m) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS purity_ppm
       |FROM j GROUP BY 1
       |ORDER BY 1""".stripMargin
  }
}
