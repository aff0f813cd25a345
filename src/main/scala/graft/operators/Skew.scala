package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5). AQE's skew-join split handles
  * most runtime skew on sort-merge joins; salting is the explicit tool for
  * the cases AQE can't re-plan — aggregations on heavy-hitter keys and
  * joins where one build key dominates.
  *
  * Semantics are identical to the unsalted forms (the spec pins this);
  * only the exchange layout changes: the skewed side spreads each key over
  * `salt` subkeys, the other side replicates each row `salt` times, so a
  * key that used to land on one reducer now occupies `salt` of them.
  */
object Skew {

  /** Inner equi-join where `left` is skewed on `key`: left rows are salted
    * with a deterministic per-row subkey (hash-based, no rand() — keeps
    * retries/speculation consistent), right rows are replicated across all
    * subkeys. Result equals `left.join(right, key)` row-for-row. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salt)).cast("int"))
    val explodedRight = right.withColumn("_salt",
      explode(expr(s"sequence(0, ${salt - 1})")))
    saltedLeft.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage skew-proof aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. For algebraic aggregates this is exactly
    * the map-side-combine shape, made explicit so a heavy-hitter key is
    * first reduced `salt`-ways in parallel. `partials` aggregate the raw
    * rows; `finals` merge the partials (e.g. sum/sum, count/sum). */
  def saltedAgg(df: DataFrame, key: String, salt: Int,
                partials: Seq[Column], finals: Seq[Column]): DataFrame =
    df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salt)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
}
