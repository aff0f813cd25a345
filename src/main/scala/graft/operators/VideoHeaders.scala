package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** REAL video-container header decoding (round 8) — the MP4/ISO-BMFF
  * member of the [[ImageHeaders]]/[[AudioHeaders]] family, completing the
  * image/audio/video triad: track count, video dimensions, movie
  * timescale/duration straight from the box tree, as pure byte arithmetic
  * in Catalyst expressions.
  *
  * ISO-BMFF layout: a sequence of BOXES — u32 big-endian size (includes
  * the 8-byte header) + 4CC type — with children NESTED inside `moov`,
  * which holds `mvhd` (movie timescale + duration) and one `trak` per
  * track whose first child `tkhd` carries 16.16 fixed-point width/height
  * (audio tracks: 0×0). The parser is TWO bounded walks of the
  * [[ImageHeaders]] fold shape: one over top-level boxes to locate
  * `moov`, one over moov's children collecting mvhd fields, the track
  * count, and the MAX track dimensions (max-over-tracks is what makes a
  * leading audio track report the video dims — fixture-pinned).
  * First-occurrence 4CC scans are wrong here too: a `free` box payload
  * may contain the bytes `moov`/`mvhd` (a committed fixture plants
  * exactly that; spec-pinned trap). Both mvhd and tkhd are decoded in
  * their v0 AND v1 (64-bit-time) variants — version 1 shifts every field
  * offset by the wider timestamps, and a v1 fixture pins the shift.
  * Malformed/truncated/non-MP4 bytes freeze to NULL fields, never throw.
  *
  * Scale shape: map-only (spec-pinned zero exchanges); frame-not-path
  * binding like its siblings. Payload decode (sample tables, codecs)
  * stays the documented media-library boundary.
  */
object VideoHeaders {

  /** Committed fixture dir (tools/make_video_fixtures.py): single-track,
    * multi-track with a 0×0 audio trak first, a v1 (64-bit-time) file,
    * the `free`-payload trap, one non-MP4 file. */
  val FixtureDir = "/root/repo/fixtures/video"

  /** Walk bound per level — real files carry a handful of boxes. */
  val MaxBoxes = 32

  private def u8(p: String) = s"CAST(conv(hex(substring(content, $p, 1)), 16, 10) AS INT)"
  private def u16be(p: String) = s"CAST(conv(hex(substring(content, $p, 2)), 16, 10) AS INT)"
  private def u32be(p: String) = s"CAST(conv(hex(substring(content, $p, 4)), 16, 10) AS BIGINT)"
  private def fourCC(p: String) = s"hex(substring(content, $p, 4))"

  /** 1-based offset of the top-level `moov` box, or 0. */
  private[graft] val MoovOffExpr: String = {
    val sz = u32be("acc.off")
    s"""aggregate(
       |  sequence(1, $MaxBoxes),
       |  named_struct('off', CAST(1 AS BIGINT), 'moov', CAST(0 AS BIGINT)),
       |  (acc, i) -> IF(acc.moov > 0 OR acc.off + 8 > octet_length(content) + 1
       |                 OR $sz < 8, acc,
       |    IF(${fourCC("acc.off + 4")} = '6D6F6F76',
       |       named_struct('off', acc.off, 'moov', acc.off),
       |       named_struct('off', acc.off + $sz, 'moov', CAST(0 AS BIGINT)))),
       |  acc -> acc.moov)""".stripMargin
  }

  /** Fold over moov's children (requires `moov_off` > 0 in scope):
    * struct(ts, dur, nt, w, h) — movie timescale, duration units (-1 if
    * no mvhd), track count, max track dims. v1 boxes shift offsets. */
  private[graft] val MoovScanExpr: String = {
    val sz = u32be("acc.off")
    val isMvhd = s"${fourCC("acc.off + 4")} = '6D766864'"
    val isTrak = s"${fourCC("acc.off + 4")} = '7472616B'"
    val trakHasTkhd = s"${fourCC("acc.off + 12")} = '746B6864'"
    val mvhdV = u8("acc.off + 8")
    val tkhdV = u8("acc.off + 16")
    val tsExpr = s"${u32be(s"acc.off + IF($mvhdV = 1, 28, 20)")}"
    val durExpr = s"${u32be(s"acc.off + IF($mvhdV = 1, 36, 24)")}"
    // tkhd sits one level deeper than mvhd: child trak at T holds the
    // tkhd box at T+8, so field offsets add BOTH headers (16) to the
    // payload offset — width int16.16 high bytes at payload+76 → T+92 (v0)
    val wExpr = s"${u16be(s"acc.off + IF($tkhdV = 1, 104, 92)")}"
    val hExpr = s"${u16be(s"acc.off + IF($tkhdV = 1, 108, 96)")}"
    s"""aggregate(
       |  sequence(1, $MaxBoxes),
       |  named_struct('off', moov_off + 8, 'ts', CAST(0 AS BIGINT),
       |               'dur', CAST(-1 AS BIGINT), 'nt', 0, 'w', 0, 'h', 0),
       |  (acc, i) -> IF(acc.off + 8 > moov_off + ${u32be("moov_off")}
       |                 OR acc.off + 8 > octet_length(content) + 1 OR $sz < 8, acc,
       |    named_struct(
       |      'off', acc.off + $sz,
       |      'ts', IF($isMvhd, $tsExpr, acc.ts),
       |      'dur', IF($isMvhd, $durExpr, acc.dur),
       |      'nt', acc.nt + IF($isTrak, 1, 0),
       |      'w', IF($isTrak AND $trakHasTkhd, greatest(acc.w, $wExpr), acc.w),
       |      'h', IF($isTrak AND $trakHasTkhd, greatest(acc.h, $hExpr), acc.h))),
       |  acc -> named_struct('ts', acc.ts, 'dur', acc.dur, 'nt', acc.nt,
       |                      'w', acc.w, 'h', acc.h))""".stripMargin
  }

  /** Header decode over any frame carrying (`file`, `content` binary,
    * `byte_len`). */
  def decodeVideoHeaders(binaries: DataFrame): DataFrame =
    binaries
      .withColumn("format", expr(
        s"CASE WHEN ${fourCC("5")} = '66747970' THEN 'mp4' ELSE 'unknown' END"))
      .withColumn("moov_off", when(col("format") === "mp4", expr(MoovOffExpr)))
      .withColumn("scan", when(col("moov_off") > 0, expr(MoovScanExpr)))
      .withColumn("n_tracks", expr("scan.nt"))
      .withColumn("width", expr("IF(scan.w > 0, scan.w, NULL)"))
      .withColumn("height", expr("IF(scan.h > 0, scan.h, NULL)"))
      .withColumn("timescale", expr("IF(scan.ts > 0, scan.ts, NULL)"))
      .withColumn("duration_units", expr("IF(scan.dur >= 0, scan.dur, NULL)"))
      .withColumn("duration_sec", expr(
        "CASE WHEN timescale > 0 AND duration_units IS NOT NULL " +
          "THEN CAST(duration_units AS DOUBLE) / timescale END"))
      .select(col("file"), col("format"), col("byte_len"), col("n_tracks"),
        col("width"), col("height"), col("timescale"), col("duration_units"),
        col("duration_sec"))

  def videoHeaderDecode(spark: SparkSession, dir: String = FixtureDir): DataFrame =
    decodeVideoHeaders(
      spark.read.format("binaryFile").load(s"$dir/*")
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
          col("content"), col("length").as("byte_len")))

  def videoHeaderDecodeQ(spark: SparkSession): DataFrame =
    videoHeaderDecode(spark)
      .select(col("file"), col("format"), col("byte_len"), col("n_tracks"),
        col("width"), col("height"), col("timescale"), col("duration_units"),
        r("duration_sec", 6))
      .orderBy("file")

  /** DuckDB twin: the two walks as recursive CTEs (top-level boxes, then
    * moov children), mvhd/tkhd fields with the same v0/v1 offset shifts,
    * dims as max-over-tracks — the independent-formulation convention of
    * this operator family's oracles. */
  val videoHeaderDecodeSql: String = {
    def du8(p: String) =
      s"((strpos('0123456789ABCDEF', substr(h, 2*($p)-1, 1))-1)*16 + strpos('0123456789ABCDEF', substr(h, 2*($p), 1))-1)"
    def du16(p: String) = s"(${du8(p)}*256 + ${du8(s"($p)+1")})"
    def du32(p: String) = s"(CAST(${du16(p)} AS BIGINT)*65536 + ${du16(s"($p)+2")})"
    def cc(p: String) = s"substr(h, 2*($p)-1, 8)"
    s"""WITH RECURSIVE b AS (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file, hex(content) AS h,
       |         CAST(size AS BIGINT) AS byte_len
       |  FROM read_blob('$FixtureDir/*')
       |), f AS (
       |  SELECT file, h, byte_len,
       |         CASE WHEN ${cc("5")} = '66747970' THEN 'mp4' ELSE 'unknown' END AS format
       |  FROM b
       |), top(file, off) AS (
       |  SELECT file, CAST(1 AS BIGINT) FROM f WHERE format = 'mp4'
       |  UNION ALL
       |  SELECT s.file, s.off + ${du32("s.off")}
       |  FROM top s JOIN f ON f.file = s.file
       |  WHERE s.off + 8 <= f.byte_len + 1 AND ${du32("s.off")} >= 8
       |    AND ${cc("s.off + 4")} <> '6D6F6F76'
       |), moov AS (
       |  SELECT t.file, min(t.off) AS m
       |  FROM top t JOIN f ON f.file = t.file
       |  WHERE t.off + 8 <= f.byte_len + 1 AND ${cc("t.off + 4")} = '6D6F6F76'
       |  GROUP BY 1
       |), kids(file, off, fin) AS (
       |  SELECT moov.file, m + 8, m + ${du32("m")} - 1
       |  FROM moov JOIN f ON f.file = moov.file
       |  UNION ALL
       |  SELECT s.file, s.off + ${du32("s.off")}, s.fin
       |  FROM kids s JOIN f ON f.file = s.file
       |  WHERE s.off + 8 <= s.fin + 1 AND s.off + 8 <= f.byte_len + 1
       |    AND ${du32("s.off")} >= 8
       |), mv AS (
       |  SELECT k.file,
       |         min(CASE WHEN ${du8("k.off + 8")} = 1
       |                  THEN ${du32("k.off + 28")} ELSE ${du32("k.off + 20")} END) AS ts,
       |         min(CASE WHEN ${du8("k.off + 8")} = 1
       |                  THEN ${du32("k.off + 36")} ELSE ${du32("k.off + 24")} END) AS dur
       |  FROM kids k JOIN f ON f.file = k.file
       |  WHERE k.off + 8 <= k.fin + 1 AND ${cc("k.off + 4")} = '6D766864'
       |  GROUP BY 1
       |), tk AS (
       |  SELECT k.file, CAST(count(*) AS INT) AS nt,
       |         max(CASE WHEN ${cc("k.off + 12")} = '746B6864' THEN
       |               CASE WHEN ${du8("k.off + 16")} = 1
       |                    THEN ${du16("k.off + 104")} ELSE ${du16("k.off + 92")} END
       |             ELSE 0 END) AS w,
       |         max(CASE WHEN ${cc("k.off + 12")} = '746B6864' THEN
       |               CASE WHEN ${du8("k.off + 16")} = 1
       |                    THEN ${du16("k.off + 108")} ELSE ${du16("k.off + 96")} END
       |             ELSE 0 END) AS hh
       |  FROM kids k JOIN f ON f.file = k.file
       |  WHERE k.off + 8 <= k.fin + 1 AND ${cc("k.off + 4")} = '7472616B'
       |  GROUP BY 1
       |), j AS (
       |  SELECT f.file, f.format, f.byte_len,
       |         CASE WHEN moov.m IS NOT NULL THEN COALESCE(tk.nt, 0) END AS n_tracks,
       |         CAST(CASE WHEN tk.w > 0 THEN tk.w END AS INT) AS width,
       |         CAST(CASE WHEN tk.hh > 0 THEN tk.hh END AS INT) AS height,
       |         CASE WHEN mv.ts > 0 THEN mv.ts END AS timescale,
       |         mv.dur AS duration_units
       |  FROM f LEFT JOIN moov ON moov.file = f.file
       |         LEFT JOIN mv ON mv.file = f.file
       |         LEFT JOIN tk ON tk.file = f.file
       |)
       |SELECT file, format, byte_len, n_tracks, width, height, timescale,
       |       duration_units,
       |       ${rsql(
      "CASE WHEN timescale > 0 AND duration_units IS NOT NULL THEN CAST(duration_units AS DOUBLE) / timescale END",
      6, "duration_sec")}
       |FROM j
       |ORDER BY file""".stripMargin
  }
}
