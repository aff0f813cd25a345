package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageHeaders

/** Real header decode over the committed PNG/JPEG fixtures: known
  * dimensions, the FF C0 segment-walk trap, the unknown-format path, and
  * the map-only plan shape.
  */
class ImageHeadersSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val out = ImageHeaders.imageHeaderDecode(spark).collect()
    .map { r =>
      r.getString(0) -> (r.getString(1),
        Option(r.getAs[Integer]("width")).map(_.toInt),
        Option(r.getAs[Integer]("height")).map(_.toInt),
        Option(r.getAs[Integer]("bit_depth")).map(_.toInt),
        Option(r.getAs[Integer]("n_components")).map(_.toInt))
    }.toMap

  test("PNG IHDR fields decode for every color type / bit depth") {
    assert(out("rgb_640x480.png") == (("png", Some(640), Some(480), Some(8), Some(3))))
    assert(out("gray16_16x32.png") == (("png", Some(16), Some(32), Some(16), Some(1))))
    assert(out("palette_7x5.png") == (("png", Some(7), Some(5), Some(8), Some(1))))
    assert(out("rgba_1x1.png") == (("png", Some(1), Some(1), Some(8), Some(4))))
  }

  test("JPEG SOF segment walk: baseline, progressive, grayscale — despite the FF C0 trap") {
    // every fixture JPEG plants the FF C0 byte pair inside a DQT payload
    // BEFORE the real SOF — a first-occurrence marker scan would mis-lock
    // on it and read garbage dimensions from quantization values; the
    // length-hopping walker must land on the true frame header
    assert(out("baseline_800x600.jpg") == (("jpeg", Some(800), Some(600), Some(8), Some(3))))
    assert(out("progressive_320x200.jpg") == (("jpeg", Some(320), Some(200), Some(8), Some(3))))
    assert(out("gray_1024x768.jpg") == (("jpeg", Some(1024), Some(768), Some(8), Some(1))))
  }

  test("GIF logical screen descriptor: LE dims, packed color-resolution depth") {
    assert(out("gif87_4x4.gif") == (("gif", Some(4), Some(4), Some(1), Some(1))))
    assert(out("gif89_320x200.gif") == (("gif", Some(320), Some(200), Some(8), Some(1))))
  }

  test("BMP BITMAPINFOHEADER: signed LE dims, negative top-down height reported as |h|") {
    assert(out("bmp24_100x50.bmp") == (("bmp", Some(100), Some(50), Some(24), Some(3))))
    assert(out("bmp32_topdown_64x64.bmp") == (("bmp", Some(64), Some(64), Some(32), Some(4))))
  }

  test("non-image bytes: format unknown, NULL fields, no throw") {
    assert(out("notimage.bin") == (("unknown", None, None, None, None)))
    assert(out.size == 12, "every fixture file must emit exactly one row")
  }

  test("truncated/corrupt payloads freeze to NULL verdicts, never throw") {
    import spark.implicits._
    val png = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${ImageHeaders.FixtureDir}/rgb_640x480.png"))
    val jpg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${ImageHeaders.FixtureDir}/baseline_800x600.jpg"))
    val rows = Seq(
      ("trunc_png", png.take(12)),        // signature only, IHDR cut off
      ("trunc_jpeg", jpg.take(6)),        // SOI + APP0 marker, length cut off
      ("noise", Array.fill[Byte](64)(0x3f)),
      ("jpeg_no_sof", Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)))
      .toDF("file", "content")
      .selectExpr("file", "content", "CAST(octet_length(content) AS BIGINT) AS byte_len")
    val got = ImageHeaders.decodeHeaders(rows).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.isNullAt(3) && r.isNullAt(4))).toMap
    // signature intact → still classified png, but the IHDR reads run off
    // the end and yield NULL dims (conv of an empty hex slice)
    assert(got("trunc_png") == (("png", true)), "truncated png: NULL dims")
    assert(got("trunc_jpeg") == (("jpeg", true)), "truncated jpeg: NULL dims")
    assert(got("noise") == (("unknown", true)))
    assert(got("jpeg_no_sof") == (("jpeg", true)), "SOF-less jpeg: NULL dims")
  }

  test("plan shape: map-only — zero exchanges over the binary scan") {
    val p = ImageHeaders.imageHeaderDecode(spark).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"header decode must not shuffle:\n$p")
  }
}
