package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** REAL audio-format header decoding (round 8) — the RIFF/WAVE sibling of
  * [[ImageHeaders]]: channel count / sample rate / bit depth / PCM data
  * size / duration straight from the container chunks, as pure byte
  * arithmetic in Catalyst expressions. Together they make "multimodal
  * columns" a decoded capability across both media families the
  * environment can honestly support (pixel/PCM payload decode stays the
  * documented media-library boundary).
  *
  * RIFF layout: 'RIFF' + u32le size + 'WAVE', then CHUNKS — 4CC id, u32
  * LITTLE-endian size (the byte-order twin of JPEG's BE lengths), payload,
  * odd sizes padded. The `fmt ` chunk holds (audio_format, n_channels,
  * sample_rate, byte_rate, block_align, bits_per_sample); `data`'s size
  * is the PCM byte count. Both live at file-dependent offsets, so the
  * parser is the same bounded WALKER shape as the JPEG one: an
  * `aggregate` fold hops chunk to chunk by each size field, recording the
  * first `fmt ` offset and the first `data` size, freezing once both are
  * found or the file ends. First-occurrence scans are wrong here too — a
  * LIST metadata chunk may legally contain the bytes `fmt ` in its
  * payload (a committed fixture plants exactly that; spec-pinned).
  * Malformed/truncated/non-RIFF bytes yield NULL fields, never a throw.
  *
  * `duration_sec` = data_bytes·8 / (rate·channels·bits) — one double
  * division of exact integers, identical formula text in the DuckDB twin
  * (§6), NULL when any factor is 0/absent.
  *
  * Scale shape: map-only (spec-pinned zero exchanges); same
  * frame-not-path binding as [[ImageHeaders.decodeHeaders]].
  */
object AudioHeaders {

  /** Committed fixture dir (tools/make_audio_fixtures.py): PCM 8/16/24-bit
    * mono+stereo at 8–48 kHz, the LIST-chunk `fmt ` trap, one non-RIFF
    * file. */
  val FixtureDir = "/root/repo/fixtures/audio"

  /** Chunk-walk bound — real WAV headers carry a handful of chunks. */
  val MaxChunks = 32

  private def u8(p: String) = s"CAST(conv(hex(substring(content, $p, 1)), 16, 10) AS INT)"
  private def u16le(p: String) = s"(${u8(p)} + ${u8(s"($p) + 1")} * 256)"
  // BIGINT per byte: the top byte of a 32-bit LE size reaches 255·2²⁴,
  // which overflows INT under ANSI — an RF64 0xFFFFFFFF data-size
  // sentinel or any >2 GB chunk would throw instead of degrading
  private def u32le(p: String) =
    s"(CAST(${u8(p)} AS BIGINT) + CAST(${u8(s"($p) + 1")} AS BIGINT) * 256 + " +
      s"CAST(${u8(s"($p) + 2")} AS BIGINT) * 65536 + CAST(${u8(s"($p) + 3")} AS BIGINT) * 16777216)"

  /** Fold result: struct(fmt = 1-based offset of the `fmt ` chunk header,
    * 0 if absent; dsz = first `data` chunk's payload size, -1 if absent). */
  private[graft] val ChunkWalkExpr: String = {
    val sz = u32le("acc.off + 4")
    s"""aggregate(
       |  sequence(1, $MaxChunks),
       |  named_struct('off', CAST(13 AS BIGINT), 'fmt', CAST(0 AS BIGINT),
       |               'dsz', CAST(-1 AS BIGINT)),
       |  (acc, i) -> IF((acc.fmt > 0 AND acc.dsz >= 0)
       |                 OR acc.off + 8 > octet_length(content) + 1, acc,
       |    named_struct(
       |      'off', acc.off + 8 + $sz + ($sz % 2),
       |      'fmt', IF(hex(substring(content, acc.off, 4)) = '666D7420' AND acc.fmt = 0,
       |                acc.off, acc.fmt),
       |      'dsz', IF(hex(substring(content, acc.off, 4)) = '64617461' AND acc.dsz < 0,
       |                $sz, acc.dsz))),
       |  acc -> named_struct('fmt', acc.fmt, 'dsz', acc.dsz))""".stripMargin
  }

  /** Header decode over any frame carrying (`file`, `content` binary,
    * `byte_len`). */
  def decodeAudioHeaders(binaries: DataFrame): DataFrame =
    binaries
      .withColumn("format", expr(
        """CASE WHEN hex(substring(content, 1, 4)) = '52494646'
          |      AND hex(substring(content, 9, 4)) = '57415645' THEN 'wav'
          |     ELSE 'unknown' END""".stripMargin))
      .withColumn("walk", when(col("format") === "wav", expr(ChunkWalkExpr)))
      // fmt payload starts 8 bytes past the chunk header
      .withColumn("d", expr("IF(walk.fmt > 0, walk.fmt + 8, NULL)"))
      .withColumn("audio_format", expr(u16le("d")))
      .withColumn("n_channels", expr(u16le("d + 2")))
      .withColumn("sample_rate", expr(u32le("d + 4")))
      .withColumn("bits_per_sample", expr(u16le("d + 14")))
      .withColumn("data_bytes", expr("IF(walk.dsz >= 0, walk.dsz, NULL)"))
      .withColumn("duration_sec", expr(
        """CASE WHEN data_bytes IS NOT NULL AND sample_rate > 0
          |      AND n_channels > 0 AND bits_per_sample > 0
          |     THEN CAST(data_bytes AS DOUBLE) * 8
          |          / (sample_rate * n_channels * bits_per_sample) END""".stripMargin))
      .select(col("file"), col("format"), col("byte_len"),
        col("audio_format"), col("n_channels"), col("sample_rate"),
        col("bits_per_sample"), col("data_bytes"), col("duration_sec"))

  def audioHeaderDecode(spark: SparkSession, dir: String = FixtureDir): DataFrame =
    decodeAudioHeaders(
      spark.read.format("binaryFile").load(s"$dir/*")
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
          col("content"), col("length").as("byte_len")))

  def audioHeaderDecodeQ(spark: SparkSession): DataFrame =
    audioHeaderDecode(spark)
      .select(col("file"), col("format"), col("byte_len"), col("audio_format"),
        col("n_channels"), col("sample_rate"), col("bits_per_sample"),
        col("data_bytes"), r("duration_sec", 6))
      .orderBy("file")

  /** DuckDB twin: recursive-CTE chunk walk over read_blob hex (the
    * independent-formulation convention of [[ImageHeaders]]'s oracle). */
  val audioHeaderDecodeSql: String = {
    def du8(p: String) =
      s"((strpos('0123456789ABCDEF', substr(h, 2*($p)-1, 1))-1)*16 + strpos('0123456789ABCDEF', substr(h, 2*($p), 1))-1)"
    def du16le(p: String) = s"(${du8(p)} + ${du8(s"($p)+1")}*256)"
    def du32le(p: String) =
      s"(${du8(p)} + ${du8(s"($p)+1")}*256 + ${du8(s"($p)+2")}*65536 + ${du8(s"($p)+3")}*16777216)"
    val sz = du32le("s.off + 4")
    s"""WITH RECURSIVE b AS (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file, hex(content) AS h,
       |         CAST(size AS BIGINT) AS byte_len
       |  FROM read_blob('$FixtureDir/*')
       |), f AS (
       |  SELECT file, h, byte_len,
       |         CASE WHEN substr(h, 1, 8) = '52494646'
       |               AND substr(h, 17, 8) = '57415645' THEN 'wav'
       |              ELSE 'unknown' END AS format
       |  FROM b
       |), seg(file, off) AS (
       |  SELECT file, 13 FROM f WHERE format = 'wav'
       |  UNION ALL
       |  SELECT s.file, s.off + 8 + $sz + ($sz % 2)
       |  FROM seg s JOIN f ON f.file = s.file
       |  WHERE s.off + 8 <= f.byte_len + 1
       |), fmt AS (
       |  SELECT s.file, min(s.off) + 8 AS d
       |  FROM seg s JOIN f ON f.file = s.file
       |  WHERE s.off + 8 <= f.byte_len + 1 AND substr(f.h, 2*s.off - 1, 8) = '666D7420'
       |  GROUP BY s.file
       |), dat AS (
       |  SELECT file, dsz FROM (
       |    SELECT s.file, $sz AS dsz,
       |           row_number() OVER (PARTITION BY s.file ORDER BY s.off) AS rn
       |    FROM seg s JOIN f ON f.file = s.file
       |    WHERE s.off + 8 <= f.byte_len + 1 AND substr(f.h, 2*s.off - 1, 8) = '64617461'
       |  ) WHERE rn = 1
       |), j AS (
       |  SELECT f.file, f.format, f.byte_len,
       |         CAST(CASE WHEN d IS NOT NULL THEN ${du16le("d")} END AS INT) AS audio_format,
       |         CAST(CASE WHEN d IS NOT NULL THEN ${du16le("d + 2")} END AS INT) AS n_channels,
       |         CAST(CASE WHEN d IS NOT NULL THEN ${du32le("d + 4")} END AS BIGINT) AS sample_rate,
       |         CAST(CASE WHEN d IS NOT NULL THEN ${du16le("d + 14")} END AS INT) AS bits_per_sample,
       |         CAST(dsz AS BIGINT) AS data_bytes
       |  FROM f LEFT JOIN fmt ON fmt.file = f.file LEFT JOIN dat ON dat.file = f.file
       |)
       |SELECT file, format, byte_len, audio_format, n_channels, sample_rate,
       |       bits_per_sample, data_bytes,
       |       ${rsql(
      """CASE WHEN data_bytes IS NOT NULL AND sample_rate > 0
        |      AND n_channels > 0 AND bits_per_sample > 0
        |     THEN CAST(data_bytes AS DOUBLE) * 8
        |          / (sample_rate * n_channels * bits_per_sample) END""".stripMargin,
      6, "duration_sec")}
       |FROM j
       |ORDER BY file""".stripMargin
  }
}
