package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MEDIA SNIFFER (round 8, continuation 5) — the DISPATCH stage in
  * front of the three header-decoder families ([[ImageHeaders]],
  * [[AudioHeaders]], [[VideoHeaders]]): classify every binary by its
  * magic bytes alone — container + media class — so a mixed drop of
  * unknown files routes each blob to the right decoder (or to
  * quarantine) without trusting file extensions. Runs over ALL three
  * fixture families at once; the `not*.bin` traps classify `unknown`
  * (the whole point of sniffing).
  *
  * Cross-engine exactness (SURVEY §6): pure prefix-byte compares —
  * Spark reads bytes via substring on the binary column, DuckDB via
  * the hex-string trick ([[Multimodal]]'s convention); no parsing, no
  * walk — the sniffer deliberately reads ONLY magic offsets (PNG
  * 8-byte signature, GIF87a/89a, BM, FFD8, RIFF····WAVE, ····ftyp),
  * so it stays O(prefix) per blob at any file size.
  *
  * Scale shape: map-only over the binaryFile source (no exchange
  * before the output sort); at 100 TB this is the first pass over a
  * raw media landing zone, one prefix read per object.
  */
object MediaSniff {

  val FixtureDirs: Seq[String] = Seq(
    ImageHeaders.FixtureDir, "/root/repo/fixtures/audio", "/root/repo/fixtures/video")

  private def hexAt(pos: Int, len: Int): String =
    s"upper(hex(substring(content, $pos, $len)))"

  /** Shared classifier over a hex-prefix column `h` (DuckDB dialect). */
  private def containerCase(sub: (Int, Int) => String): String =
    s"""CASE WHEN ${sub(1, 8)} = '89504E470D0A1A0A' THEN 'png'
       |     WHEN ${sub(1, 6)} IN ('474946383761', '474946383961') THEN 'gif'
       |     WHEN ${sub(1, 2)} = '424D' THEN 'bmp'
       |     WHEN ${sub(1, 2)} = 'FFD8' THEN 'jpeg'
       |     WHEN ${sub(1, 4)} = '52494646' AND ${sub(9, 4)} = '57415645' THEN 'wav'
       |     WHEN ${sub(5, 4)} = '66747970' THEN 'mp4'
       |     ELSE 'unknown' END""".stripMargin

  private val ClassCase =
    """CASE container
      |  WHEN 'png' THEN 'image' WHEN 'gif' THEN 'image'
      |  WHEN 'bmp' THEN 'image' WHEN 'jpeg' THEN 'image'
      |  WHEN 'wav' THEN 'audio' WHEN 'mp4' THEN 'video'
      |  ELSE 'unknown' END""".stripMargin

  def mediaSniff(binaries: DataFrame): DataFrame =
    binaries
      .withColumn("container",
        expr(containerCase((p, l) => hexAt(p, l))))
      .withColumn("media_class", expr(ClassCase))
      .select(col("file"), col("media_class"), col("container"), col("byte_len"))

  def mediaSniffQ(spark: SparkSession): DataFrame =
    mediaSniff(
      spark.read.format("binaryFile").load(FixtureDirs.map(d => s"$d/*"): _*)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
          col("content"), col("length").as("byte_len")))
      .orderBy("file")

  val mediaSniffSql: String = {
    def dsub(p: Int, l: Int) = s"substr(h, ${2 * p - 1}, ${2 * l})"
    val blobs = FixtureDirs
      .map(d => s"SELECT filename, hex(content) AS h, CAST(size AS BIGINT) AS byte_len FROM read_blob('$d/*')")
      .mkString("\n       |  UNION ALL ")
    s"""WITH b AS (
       |  $blobs
       |), c AS (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file, byte_len,
       |         ${containerCase(dsub).replace("\n", "\n       |         ")} AS container
       |  FROM b
       |)
       |SELECT file,
       |       ${ClassCase.replace("\n", "\n       |       ")} AS media_class,
       |       container, byte_len
       |FROM c
       |ORDER BY file""".stripMargin
  }
}
