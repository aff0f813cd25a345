package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VideoHeaders

/** MP4 box-walk decode over the committed fixtures: known dims/timing,
  * the free-payload 4CC trap, v1 offset shifts, max-over-tracks dims,
  * non-MP4 path, truncation robustness, map-only plan.
  */
class VideoHeadersSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val out = VideoHeaders.videoHeaderDecode(spark).collect()
    .map { r =>
      r.getString(0) -> (r.getString(1),
        Option(r.getAs[Integer]("n_tracks")).map(_.toInt),
        Option(r.getAs[Integer]("width")).map(_.toInt),
        Option(r.getAs[Integer]("height")).map(_.toInt),
        Option(r.getAs[java.lang.Long]("timescale")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("duration_units")).map(_.toLong))
    }.toMap

  test("single-track mp4 decodes dims + timing despite the free-box 'moov' payload trap") {
    // the file carries a free box whose payload contains the bytes
    // 'moov'+'mvhd' with a bogus timescale block before the real moov —
    // a first-occurrence 4CC scan locks on it; box hopping must not
    assert(out("video_640x360.mp4") ==
      (("mp4", Some(1), Some(640), Some(360), Some(1000L), Some(2500L))))
  }

  test("multi-track: leading 0x0 audio trak, dims are max over tracks") {
    assert(out("two_tracks_1920x1080.mp4") ==
      (("mp4", Some(2), Some(1920), Some(1080), Some(600L), Some(1200L))))
  }

  test("v1 (64-bit-time) mvhd/tkhd shift every field offset") {
    assert(out("v1_times_320x240.mp4") ==
      (("mp4", Some(1), Some(320), Some(240), Some(90000L), Some(450000L))))
  }

  test("non-MP4 bytes: unknown, NULL fields; truncated mp4 freezes to NULLs") {
    assert(out("notvideo.bin") == (("unknown", None, None, None, None, None)))
    import spark.implicits._
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${VideoHeaders.FixtureDir}/video_640x360.mp4"))
    val rows = Seq(
      ("trunc_pre_moov", full.take(40)),  // ftyp intact, moov never arrives
      ("trunc_mid_moov", full.take(70)))
      .toDF("file", "content")
      .selectExpr("file", "content", "CAST(octet_length(content) AS BIGINT) AS byte_len")
    val got = VideoHeaders.decodeVideoHeaders(rows).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.isNullAt(4) && r.isNullAt(6))).toMap
    assert(got("trunc_pre_moov") == (("mp4", true)))
    assert(got("trunc_mid_moov") == (("mp4", true)))
  }

  test("plan shape: map-only — zero exchanges over the binary scan") {
    val p = VideoHeaders.videoHeaderDecode(spark).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"video header decode must not shuffle:\n$p")
  }
}
