package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Cross-channel CORRELATION (round 8, continuation) — the inter-channel
  * gold feature the per-channel family (#3–#5) doesn't cover: per trial,
  * the Pearson correlation between each channel pair's sample-aligned
  * series. In EEG terms this is the connectivity / montage-sanity matrix
  * (two electrodes reading near-identically usually means a bridge; the
  * reference computes per-channel stats at main/gold.py:40-81 but has no
  * cross-channel feature).
  *
  * §6 discipline: the five sufficient statistics (Σx, Σy, Σx², Σy², Σxy)
  * are EXACT BIGINT sums over integer cents — associative, immune to
  * summation order — and r is the closed-form
  * `(nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²))` evaluated in ONE
  * shared text both engines: two exact-integer subtractions, one double
  * multiply, one IEEE sqrt (correctly rounded in both engines), one
  * divide. A zero-variance side (flatline channel) yields NULL r by an
  * integer-compare guard — silver's σ=0 convention, decided before any
  * float exists.
  *
  * Alignment contract: samples pair by (trial, sample_idx) — bronze's
  * per-channel row_number — i.e. by ORDINAL position, the standard
  * equal-rate alignment (the FS analog; for unequal channel lengths the
  * overlap is the common prefix, n = min length, via the inner join).
  *
  * Scale shape: bronze is checkpointed ONCE (it feeds both self-join
  * sides — the multi-consumer invariant; its own cost is one
  * (trial,channel) window pass), the self-join keys on
  * (trial, sample_idx) so matches per key are bounded by the CHANNEL
  * CATALOG (≤ |channels| rows each side — never a skew risk), and the
  * closing agg emits |trials|·C(channels,2) rows. At 100 TB: partition
  * by trial, n per group bounded by seconds × FS (the [[Iir]] argument).
  */
object ChannelCorr {

  /** One formula text for both engines (NULL on zero variance). */
  private val RFormula: String =
    """CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN NULL
      |     ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
      |          sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
      |END""".stripMargin

  def channelCorrelation(events: DataFrame): DataFrame = {
    val b = SignalOps.bronzeIngest(events)
      .select(col("trial_id"), col("channel"), col("sample_idx"), col("c"))
      .localCheckpoint()
    val left = b.select(col("trial_id"), col("sample_idx"),
      col("channel").as("ch1"), col("c").as("x"))
    val right = b.select(col("trial_id"), col("sample_idx"),
      col("channel").as("ch2"), col("c").as("y"))
    left.join(right, Seq("trial_id", "sample_idx"))
      .filter(col("ch1") < col("ch2"))
      .groupBy("trial_id", "ch1", "ch2")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
        sum(expr("x * y")).as("sxy"))
      .withColumn("r", expr(RFormula))
  }

  def channelCorrelationQ(events: DataFrame): DataFrame =
    channelCorrelation(events)
      .select(col("trial_id"), col("ch1"), col("ch2"), col("n"), r("r", 4))
      .orderBy("trial_id", "ch1", "ch2")

  /** Oracle rides [[SignalOps.baseCtes]]' bronze CTE (one text with the
    * whole signal family) + the same join/sums/formula. */
  val channelCorrelationSql: String =
    s"""${SignalOps.baseCtes}, ca AS (
       |  SELECT trial_id, sample_idx, channel AS ch1, c AS x FROM bronze
       |), cb AS (
       |  SELECT trial_id, sample_idx, channel AS ch2, c AS y FROM bronze
       |), cj AS (
       |  SELECT ca.trial_id, ca.ch1, cb.ch2, ca.x, cb.y
       |  FROM ca JOIN cb
       |    ON ca.trial_id = cb.trial_id AND ca.sample_idx = cb.sample_idx
       |   AND ca.ch1 < cb.ch2
       |), cg AS (
       |  SELECT trial_id, ch1, ch2,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
       |         CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM cj GROUP BY 1, 2, 3
       |)
       |SELECT trial_id, ch1, ch2, n,
       |       ${rsql(RFormula.linesIterator.mkString(" "), 4, "r")}
       |FROM cg
       |ORDER BY trial_id, ch1, ch2""".stripMargin
}
