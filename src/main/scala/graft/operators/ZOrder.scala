package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-ORDER layout planning over the event stream — the lakehouse
  * OPTIMIZE ZORDER BY (user_id, day) primitive, emulated relationally
  * (same environment stand-in class as [[Cdc]]): interleave the low 16
  * bits of the two clustering dimensions into a Morton key, bucket rows
  * by the key's high bits (= the file a compactor would write), and emit
  * each bucket's ZONE MAP (min/max per dimension + row count) — the
  * stats a scan planner prunes files with. A time-sorted layout makes
  * every file span the full user_id range (user-predicate scans read
  * everything); the Morton layout bounds BOTH dims per file, which is
  * the whole point of multi-dimensional clustering (spec-measured:
  * mean per-bucket user span ≪ the time-layout's).
  *
  * Each dimension is MIN-MAX NORMALIZED to the full 16-bit key width
  * before interleaving (what production OPTIMIZE ZORDER does via range
  * ids): raw low-bit masking would let whichever dimension happens to
  * occupy the higher bit positions dominate every bucket boundary — on
  * a corpus whose user ids span 4 bits and epoch days span 20k, the
  * "z-order" would degenerate to a day sort. Normalization is
  * `(v − min)·(2¹⁶−1) div max(span, 1)` off a ONE-ROW stats frame
  * (broadcast-fact class, ref_integrity precedent) — integer-exact on
  * both engines.
  *
  * Cross-engine exactness: the bit interleave is written as pure
  * non-negative integer div/mod/mul arithmetic — 16 explicit bit terms
  * per dimension, no engine bit operators (Spark `div` / DuckDB `//` is
  * the only dialect split, handled by the shared generator). Day is the
  * integer-µs epoch-day convention ([[Retention.UsPerDay]]).
  *
  * Scale shape: one tiny stats aggregate (1 row, broadcast), one
  * map-side projection (the Morton terms are one codegen'd expression)
  * + ONE aggregate exchange keyed by bucket — |buckets| output rows. At
  * 100 TB the same key feeds `repartitionByRange(morton)` +
  * sortWithinPartitions for the actual rewrite; the plan query is its
  * zone-map audit.
  */
object ZOrder {

  /** Bits per dimension folded into the key. */
  val DimBits = 16

  /** Bucket = morton's top [[BucketBits]] bits → ≤ 2^BucketBits files. */
  val BucketBits = 6

  /** Morton interleave of the low [[DimBits]] bits of non-negative `x`
    * (even bit positions) and `y` (odd positions), as pure div/mod/mul
    * integer arithmetic. `divOp` is `div` (Spark) or `//` (DuckDB). */
  private[graft] def mortonExpr(x: String, y: String, divOp: String): String =
    (0 until DimBits).map { i =>
      s"((($x $divOp ${1L << i}) % 2) * ${1L << (2 * i)}) + " +
        s"((($y $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  private val MaxCode = (1L << DimBits) - 1
  private val BucketDiv = 1L << (2 * DimBits - BucketBits)

  private def normExpr(v: String, lo: String, hi: String, divOp: String): String =
    s"((($v - $lo) * $MaxCode) $divOp (CASE WHEN $hi > $lo THEN $hi - $lo ELSE 1 END))"

  /** The Morton key as a SELF-CONTAINED Column over a (user_id, day)
    * frame, min-max stats inlined as literals via a 1-row driver probe
    * (the documented bounded-probe class) — the form
    * [[graft.sources.CommitLog.compactClustered]] can range-partition
    * by (a range partitioner needs a plain sort key, not a
    * stats-joined frame). Same generator text as [[mortonKeyed]]. */
  private[graft] def mortonKeyExpr(frame: DataFrame): org.apache.spark.sql.Column = {
    val r = frame.agg(min("user_id"), max("user_id"),
      min("day"), max("day")).head
    if (r.isNullAt(0)) lit(0L)
    else {
      val xn = normExpr("user_id", r.getLong(0).toString, r.getLong(1).toString, "div")
      val yn = normExpr("day", r.getLong(2).toString, r.getLong(3).toString, "div")
      expr(mortonExpr(xn, yn, "div"))
    }
  }

  /** (user_id, epoch-day) projection shared with [[ZoneMapPrune]]. */
  private[graft] def baseFrame(events: DataFrame): DataFrame =
    events.select(col("user_id"),
      expr(s"unix_micros(ts) div ${Retention.UsPerDay}").as("day"))

  def zorderPlan(events: DataFrame): DataFrame =
    zorderPlanFromBase(baseFrame(events))

  /** base + the normalized Morton key `zkey` — the advisor's own
    * clustering expression, factored out so the PHYSICAL rewrite
    * ([[graft.sources.CommitLog.compactClustered]], round 14) consumes
    * the IDENTICAL key text the plan audit buckets by: one generator
    * powers both the advice and the apply (the salting_plan loop
    * pattern). */
  private[graft] def mortonKeyed(base: DataFrame): DataFrame = {
    val stats = base.agg(min("user_id").as("lo_u"), max("user_id").as("hi_u"),
      min("day").as("lo_d"), max("day").as("hi_d"))
    val xn = normExpr("user_id", "lo_u", "hi_u", "div")
    val yn = normExpr("day", "lo_d", "hi_d", "div")
    val m = mortonExpr(xn, yn, "div")
    base.join(broadcast(stats))
      .withColumn("zkey", expr(m))
      .drop("lo_u", "hi_u", "lo_d", "hi_d")
  }

  private[graft] def zorderPlanFromBase(base: DataFrame): DataFrame = {
    mortonKeyed(base)
      .withColumn("bucket", expr(s"zkey div $BucketDiv"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("day").as("min_day"), max("day").as("max_day"))
  }

  def zorderPlanQ(events: DataFrame): DataFrame =
    zorderPlan(events).orderBy("bucket")

  /** `base` CTE body (shared with [[ZoneMapPrune]]'s oracle — one text). */
  private[graft] val BaseCteSql: String =
    s"""base AS (
       |  SELECT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) // ${Retention.UsPerDay} AS day
       |  FROM events
       |)""".stripMargin

  /** stats/keyed/zones CTE chain over `base` (shared with the prune oracle). */
  private[graft] val ZonesCtesSql: String = {
    val xn = normExpr("user_id", "lo_u", "hi_u", "//")
    val yn = normExpr("day", "lo_d", "hi_d", "//")
    val m = mortonExpr(xn, yn, "//")
    s"""stats AS (
       |  SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
       |         min(day) AS lo_d, max(day) AS hi_d
       |  FROM base
       |), keyed AS (
       |  SELECT user_id, day, $m // $BucketDiv AS bucket
       |  FROM base CROSS JOIN stats
       |), zones AS (
       |  SELECT bucket, count(*) AS n_events,
       |         min(user_id) AS min_user, max(user_id) AS max_user,
       |         min(day) AS min_day, max(day) AS max_day
       |  FROM keyed GROUP BY bucket
       |)""".stripMargin
  }

  val zorderPlanSql: String =
    s"""WITH $BaseCteSql, $ZonesCtesSql
       |SELECT * FROM zones
       |ORDER BY bucket""".stripMargin
}
