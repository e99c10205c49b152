package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp4

/** X1 — ISO-BMFF (MP4) box-walk metadata: the honest container half of
  * modern video (sample decode needs codecs and stays stubbed). Fixture
  * encode → walk must recover every field; malformed trees classify. */
class Mp4Spec extends AnyFunSuite {

  private val vid = Mp4.VideoSpec("avc1", 640, 360, nSamples = 50, delta = 512, timescale = 12800)
  private val aud = Mp4.AudioSpec("mp4a", 48000, 2, nSamples = 100, delta = 960)

  test("round-trip recovers brand, duration, codecs, dims, rate/channels, counts") {
    for {
      v1 <- Seq(false, true)
      large <- Seq(false, true)
      uuid <- Seq(false, true)
    } {
      val bytes = Mp4.encode("isom", 600, Some(vid), Some(aud),
        v1Boxes = v1, largesizeMdat = large, uuidInMoov = uuid)
      val m = Mp4.videoMeta(bytes).getOrElse(fail(s"v1=$v1 large=$large uuid=$uuid"))
      assert(m.brand == "isom")
      // video: 50 × 512 / 12800 = 2.000 s; audio: 100 × 960 / 48000 = 2.000 s
      assert(m.durationMs == 2000)
      val v = m.video.get
      assert(v.codec == "avc1" && v.width == 640 && v.height == 360 && v.nSamples == 50)
      assert(v.durationMs == 2000 && v.sampleRate == 0 && v.channels == 0)
      val a = m.audio.get
      assert(a.codec == "mp4a" && a.sampleRate == 48000 && a.channels == 2 &&
        a.nSamples == 100 && a.width == 0 && a.height == 0)
    }
  }

  test("movie duration is the longest track, in the movie timescale") {
    val shortAud = aud.copy(nSamples = 25) // 0.5 s vs video 2.0 s
    val m = Mp4.videoMeta(Mp4.encode("mp42", 1000, Some(vid), Some(shortAud))).get
    assert(m.durationMs == 2000 && m.audio.get.durationMs == 500)
  }

  test("single-track files parse; the absent track reads None") {
    val vOnly = Mp4.videoMeta(Mp4.encode("isom", 600, Some(vid), None)).get
    assert(vOnly.video.isDefined && vOnly.audio.isEmpty)
    val aOnly = Mp4.videoMeta(Mp4.encode("isom", 600, None, Some(aud))).get
    assert(aOnly.video.isEmpty && aOnly.audio.get.codec == "mp4a")
  }

  test("non-BMFF payloads classify: junk, lone mdat, missing moov, ftyp-after-content") {
    assert(Mp4.videoMeta(null).isEmpty)
    assert(Mp4.videoMeta(Array.fill(200)(0x41.toByte)).isEmpty)
    val bytes = Mp4.encode("isom", 600, Some(vid), Some(aud))
    // strip the leading ftyp box (its size is the first u32): moov with
    // no ftyp is not a well-formed file
    val ftypLen = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    assert(Mp4.videoMeta(bytes.drop(ftypLen)).isEmpty)
    // mdat before ftyp: the brand gate refuses (content precedes ftyp)
    val mdat = Array[Byte](0, 0, 0, 16, 'm', 'd', 'a', 't', 0, 0, 0, 0, 0, 0, 0, 0)
    assert(Mp4.videoMeta(mdat ++ bytes).isEmpty)
    assert(Mp4.isMp4(bytes) && !Mp4.isMp4(mdat ++ bytes))
  }

  test("leading free/skip/wide boxes before ftyp are tolerated (QuickTime writers)") {
    val bytes = Mp4.encode("mp41", 600, Some(vid), None)
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    val wide = Array[Byte](0, 0, 0, 8, 'w', 'i', 'd', 'e')
    val m = Mp4.videoMeta(free ++ wide ++ bytes)
    assert(m.exists(_.brand == "mp41"))
  }

  test("truncation at every prefix classifies or parses — never throws") {
    val bytes = Mp4.encode("isom", 600, Some(vid), Some(aud), v1Boxes = true)
    var step = 1
    var n = 0
    while (step <= bytes.length) {
      Mp4.videoMeta(bytes.take(bytes.length - step)) // any outcome but a throw
      n += 1
      step = if (step < 64) step + 1 else step + 23
    }
    assert(n > 60)
  }

  test("hostile size fields classify without throwing or hanging") {
    val good = Mp4.encode("isom", 600, Some(vid), Some(aud))
    // lying top-level size: beyond the buffer
    val lie = good.clone(); lie(0) = 0x7f.toByte
    assert(Mp4.videoMeta(lie).isEmpty)
    // size smaller than its own header (4): walk must stop, not loop
    val tiny = good.clone(); tiny(0) = 0; tiny(1) = 0; tiny(2) = 0; tiny(3) = 4
    Mp4.videoMeta(tiny)
    // largesize with the top bit set (negative as signed 64-bit)
    val neg = Mp4.encode("isom", 600, Some(vid), None, largesizeMdat = true).clone()
    val mdatAt = neg.length - (16 + 64)
    neg(mdatAt + 8) = 0xff.toByte
    Mp4.videoMeta(neg)
    // a sea of 8-byte boxes: the box budget bounds the walk
    val sea = Array.tabulate[Byte](64 * 1024) { i =>
      (i % 8 match {
        case 3 => 8
        case 4 => 'f'; case 5 => 'r'; case 6 => 'e'; case 7 => 'e'
        case _ => 0
      }).toByte
    }
    val t0 = System.nanoTime()
    assert(Mp4.videoMeta(sea).isEmpty)
    assert((System.nanoTime() - t0) < 2e9, "budget must bound the walk")
  }

  test("stts whose declared entry count overruns its box drops the sample count only") {
    val bytes = Mp4.encode("isom", 600, Some(vid), None)
    // find the stts box and inflate its entry count; the track still
    // parses (codec/duration intact) with nSamples degraded to 0
    val idx = bytes.indexOfSlice("stts".getBytes("US-ASCII"))
    assert(idx > 0)
    val bad = bytes.clone()
    bad(idx + 8) = 0x7f.toByte // entry_count high byte: ~2^30 entries
    val m = Mp4.videoMeta(bad).getOrElse(fail("track must survive a bad stts"))
    assert(m.video.get.codec == "avc1" && m.video.get.nSamples == 0)
  }

  test("q53 fixture closed form holds across doc ids") {
    (0L until 120L).foreach { d =>
      val m = Mp4.videoMeta(graft.fixtures.FixtureGen.mp4Bytes(d))
        .getOrElse(fail(s"doc $d must parse"))
      val n = 24 + d % 48
      assert(m.durationMs == 40 * n, s"doc $d")
      assert(m.brand == Seq("isom", "mp42", "mp41")((d % 3).toInt))
      val v = m.video.get
      assert(v.codec == Seq("avc1", "hev1", "vp09", "av01")((d % 4).toInt))
      assert(v.width == 160 + 16 * (d % 28) && v.height == 90 + 2 * (d % 40))
      assert(v.nSamples == n)
      val a = m.audio.get
      assert(a.codec == (if (d % 2 == 0) "mp4a" else "Opus"))
      assert(a.sampleRate == Seq(48000, 44100, 32000)((d % 3).toInt))
      assert(a.channels == 1 + d % 2 && a.durationMs == 20 * n)
    }
  }
}
