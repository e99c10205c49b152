package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mkv

/** X1 — Matroska/WebM EBML metadata: varint ID/size grammar, the
  * Info/Tracks tree, unknown-size Segments. Malformed trees classify. */
class MkvSpec extends AnyFunSuite {

  private val vid = Mkv.VideoTrack("V_VP9", 1280, 720)
  private val aud = Mkv.AudioTrack("A_OPUS", 48000, 2)

  test("round-trip recovers doc type, duration, codecs, dims, rate/channels") {
    for {
      unknown <- Seq(false, true)
      wide <- Seq(false, true)
    } {
      val bytes = Mkv.encode("webm", 12345.0, Some(vid), Some(aud),
        unknownSegmentSize = unknown, wideDuration = wide)
      val m = Mkv.videoMeta(bytes).getOrElse(fail(s"unknown=$unknown wide=$wide"))
      assert(m.docType == "webm" && m.durationMs == 12345)
      assert(m.videoCodec == "V_VP9" && m.width == 1280 && m.height == 720)
      assert(m.audioCodec == "A_OPUS" && m.sampleRate == 48000 && m.channels == 2)
    }
  }

  test("a non-default TimestampScale rescales the duration float") {
    // scale 500µs: Duration element holds durationMs·1e6/scale units
    val bytes = Mkv.encode("matroska", 4000.0, Some(vid), None,
      timestampScale = 500000L)
    val m = Mkv.videoMeta(bytes).getOrElse(fail("scaled file must parse"))
    assert(m.durationMs == 4000)
  }

  test("single-track files parse; absent track fields stay empty/zero") {
    val vOnly = Mkv.videoMeta(Mkv.encode("webm", 1000.0, Some(vid), None)).get
    assert(vOnly.videoCodec == "V_VP9" && vOnly.audioCodec == "")
    val aOnly = Mkv.videoMeta(Mkv.encode("matroska", 1000.0, None, Some(aud))).get
    assert(aOnly.videoCodec == "" && aOnly.width == 0 && aOnly.audioCodec == "A_OPUS")
  }

  test("junk, truncation, and a missing EBML header classify — never throw") {
    assert(Mkv.videoMeta(null).isEmpty)
    assert(Mkv.videoMeta(Array.fill(64)(0x42.toByte)).isEmpty)
    val bytes = Mkv.encode("webm", 9000.0, Some(vid), Some(aud))
    var cut = 1
    while (cut < bytes.length) {
      Mkv.videoMeta(bytes.take(cut)) // any outcome but a throw
      cut += 5
    }
    // EBML magic present but Segment stripped → no tracks → classify
    val headerLen = {
      // header element: 4-byte ID + size varint + payload; locate Segment ID
      val idx = bytes.indexOfSlice(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte))
      idx
    }
    assert(Mkv.videoMeta(bytes.take(headerLen)).isEmpty)
  }

  test("hostile sizes classify or truncate — lying lengths, element floods") {
    val good = Mkv.encode("webm", 9000.0, Some(vid), Some(aud))
    // lying top-level size on the EBML header
    val lie = good.clone()
    lie(4) = 0xff.toByte // size byte → much larger than the buffer? (w=1 max 127)
    Mkv.videoMeta(lie) // must not throw
    // a flood of tiny elements: budget-bounded walk
    val flood = Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte, 0x81.toByte, 0x00.toByte) ++
      Array.fill(32 * 1024)(Array(0xec.toByte, 0x80.toByte)).flatten // Void elements
    val t0 = System.nanoTime()
    Mkv.videoMeta(flood)
    assert(System.nanoTime() - t0 < 2e9, "budget must bound the walk")
  }

  test("unknown size on a non-streamable element stops the walk (classifies)") {
    // hand-build: EBML header, then Info with all-ones size — not tolerated
    val good = Mkv.encode("webm", 9000.0, Some(vid), None)
    val segIdx = good.indexOfSlice(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte))
    val header = good.take(segIdx)
    val infoUnknown = Array(0x15.toByte, 0x49.toByte, 0xa9.toByte, 0x66.toByte, 0xff.toByte)
    assert(Mkv.videoMeta(header ++ infoUnknown).isEmpty)
  }

  test("q56 fixture closed form holds across doc ids") {
    (0L until 120L).foreach { d =>
      val m = Mkv.videoMeta(graft.fixtures.FixtureGen.mkvBytes(d))
        .getOrElse(fail(s"doc $d must parse"))
      assert(m.docType == (if (d % 2 == 0) "webm" else "matroska"), s"doc $d")
      assert(m.durationMs == 5000 + 250 * (d % 37))
      assert(m.videoCodec == Seq("V_VP8", "V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")((d % 4).toInt))
      assert(m.width == 320 + 16 * (d % 20) && m.height == 180 + 2 * (d % 50))
      assert(m.audioCodec == (if (d % 2 == 0) "A_OPUS" else "A_VORBIS"))
      assert(m.sampleRate == Seq(48000, 44100, 32000)((d % 3).toInt))
      assert(m.channels == 1 + d % 2)
    }
  }
}
