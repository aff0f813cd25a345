package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Language-label CONFUSION matrix (round 8, continuation) — the audit
  * between two metadata sources the suite already computes separately:
  * the corpus's DECLARED `lang` column (what the crawler claimed) vs
  * [[TextOps.langId]]'s content-based prediction. Mislabeled language is
  * a top corpus-poisoning vector (a "fr" slice full of English inflates
  * the French mixture weight and starves actual French) — the confusion
  * matrix is where that audit starts, per (declared, predicted) cell
  * with row shares.
  *
  * Cross-engine exactness (§6): cell counts are BIGINTs; row share is
  * integer ppm over the declared-language row total (window sum). The
  * oracle nests langIdSql verbatim (minus its ORDER BY) — the shared-CTE
  * convention, so the marker scoring cannot drift between the per-doc
  * query and this rollup.
  *
  * Scale shape: langId is a fused map pass; the matrix is one
  * map-side-combinable (lang, pred_lang) count — ≤ |langs|² rows — and
  * the share window runs over those catalog-sized cells.
  */
object LangConfusion {

  def langConfusion(documents: DataFrame): DataFrame = {
    val cells = TextOps.langId(documents)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    cells
      .withColumn("row_total", sum("n").over(Window.partitionBy("lang")))
      .withColumn("row_ppm", expr("n * 1000000 div row_total"))
      .select(col("lang"), col("pred_lang"), col("n"), col("row_ppm"))
      .orderBy("lang", "pred_lang")
  }

  def langConfusionQ(documents: DataFrame): DataFrame =
    langConfusion(documents)

  val langConfusionSql: String = {
    val inner = TextOps.langIdSql.replace("ORDER BY doc_id", "")
    s"""WITH li AS (
       |$inner
       |), c AS (
       |  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM li GROUP BY 1, 2
       |)
       |SELECT lang, pred_lang, n,
       |       n * 1000000 // CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS row_ppm
       |FROM c
       |ORDER BY lang, pred_lang""".stripMargin
  }
}
