package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.fixtures.FixtureGen
import graft.functions.{Aac, H264, Ivf, MediaMeta}

/** X1 — modern-codec STREAM metadata (the honestly-scoped layer: sample
  * decode needs codec libraries the container doesn't ship, but the
  * bitstream grammar is exact): ADTS/AAC frame chains, H.264 SPS with
  * exp-Golomb + RBSP emulation prevention + crop arithmetic, and IVF
  * (VP8/VP9/AV1) containers with walked-not-trusted frame counts. */
class CodecMetaSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(tests)
        .withInitialSeed(Seed(20260819L)), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ---------------- ADTS/AAC ----------------

  test("adts: chain walk, all header fields, CRC form, duration math") {
    val bytes = Aac.encode(profile = 1, srIdx = 3, channels = 2,
      payloadLens = Vector(100, 37, 250, 8))
    val m = Aac.audioMeta(bytes).get
    assert(m.profile == "lc" && m.sampleRate == 48000 && m.channels == 2)
    assert(m.nFrames == 4 && !m.crcProtected && !m.mpeg2)
    assert(m.durationMs == 4L * 1024 * 1000 / 48000)
    val crc = Aac.audioMeta(Aac.encode(0, 0, 5, Vector(10, 10, 10),
      withCrc = true)).get
    assert(crc.profile == "main" && crc.sampleRate == 96000 &&
      crc.channels == 5 && crc.crcProtected)
  }

  test("adts: a broken chain, flipped params mid-stream, or <3 frames classify") {
    val ok = Aac.encode(1, 3, 2, Vector(50, 50, 50))
    assert(Aac.audioMeta(ok).isDefined)
    assert(Aac.audioMeta(ok.dropRight(1)).isEmpty, "length must land on EOF")
    assert(Aac.audioMeta(Aac.encode(1, 3, 2, Vector(50, 50))).isEmpty,
      "two frames are noise, not audio (anti-false-positive)")
    // flip the third frame's channel bits: chains but params diverge
    val flip = ok.clone()
    flip(2 * 57 + 3) = (flip(2 * 57 + 3) ^ 0x40).toByte
    assert(Aac.audioMeta(flip).isEmpty)
    // junk prefix resyncs (real demuxer behavior)
    val prefixed = Array[Byte](1, 2, 3) ++ ok
    assert(Aac.audioMeta(prefixed).exists(_.nFrames == 3))
  }

  test("adts: trailing ID3v1 tag / sub-frame junk tolerated like the mp3 walk") {
    val ok = Aac.encode(1, 3, 2, Vector(50, 50, 50))
    // a 128-byte ID3v1 tag after the last full frame is routine in the
    // wild; it must not classify the stream as non-AAC (ADVICE r5)
    val id3 = new Array[Byte](128)
    id3(0) = 'T'; id3(1) = 'A'; id3(2) = 'G'
    assert(Aac.audioMeta(ok ++ id3).exists(_.nFrames == 3))
    // sub-frame junk under the slack budget also tolerated
    assert(Aac.audioMeta(ok ++ Array[Byte](1, 2, 3)).exists(_.nFrames == 3))
    // junk far beyond a frame + 128 bytes is NOT a valid chain
    assert(Aac.audioMeta(ok ++ new Array[Byte](4096)).isEmpty)
  }

  test("adts vs mp3: layer bits keep the two magic-less walks disjoint") {
    val aac = FixtureGen.aacBytes(7L)
    val mp3 = FixtureGen.mp3Bytes(7L)
    assert(Aac.audioMeta(aac).isDefined && Aac.audioMeta(mp3).isEmpty)
    assert(graft.functions.Mpeg.audioMeta(mp3).isDefined &&
      graft.functions.Mpeg.audioMeta(aac).isEmpty)
    assert(MediaMeta.describe(aac).container == "adts")
    assert(MediaMeta.describe(mp3).container == "mpeg")
  }

  // ---------------- H.264 SPS ----------------

  test("h264: escape/unescape are exact inverses on arbitrary payloads") {
    val gen = Gen.containerOf[Array, Byte](Gen.choose(-4, 4).map(_.toByte))
    check("rbsp-escape-roundtrip", Prop.forAll(gen) { raw =>
      val escaped = H264.escapeRbsp(raw)
      // the escaped stream never contains a bare 00 00 0x run
      var zeros = 0
      var clean = true
      escaped.foreach { b =>
        if (zeros >= 2 && (b & 0xff) <= 2) clean = false
        zeros = if (b == 0) zeros + 1 else 0
      }
      clean &&
        H264.unescapeRbsp(escaped, 0, escaped.length).toSeq == raw.toSeq
    })
  }

  test("h264: SPS round-trip with crop — 1080p is 1088-8, not 1088") {
    for ((w, h) <- Seq((1920, 1080), (640, 480), (1280, 720), (354, 198))) {
      val m = H264.spsMeta(H264.encodeSps(w, h)).get
      assert((m.width, m.height) == ((w, h)), s"${w}x$h")
      assert(m.profileIdc == 66 && m.frameMbsOnly)
      assert(m.cropped == (w % 16 != 0 || h % 16 != 0))
    }
  }

  test("h264: emulation prevention in a real SPS is load-bearing") {
    // constraint byte 0, level 0, sps_id=63 puts 00 00 01 in the raw
    // RBSP; without escaping the NAL scan would cut the SPS in half
    val wmb = 39; val hmb = 29
    val wtr = new H264.BitWriter
    wtr.u(8, 66).u(8, 0).u(8, 0)
    wtr.ue(63) // sps_id: 6 zeros + 7 bits -> a 00 00 0x byte pattern
    wtr.ue(4).ue(0).ue(4).ue(1).u(1, 0)
    wtr.ue(wmb - 1).ue(hmb - 1)
    wtr.u(1, 1).u(1, 1).u(1, 0)
    val raw = wtr.finishRbsp()
    val escaped = H264.escapeRbsp(raw)
    assert(escaped.length > raw.length, "the fixture must actually escape")
    val stream = Array[Byte](0, 0, 0, 1, 0x67) ++ escaped
    val m = H264.spsMeta(stream).get
    assert(m.width == wmb * 16 && m.height == hmb * 16 && m.levelIdc == 0)
  }

  test("h264: scan skips non-SPS NALs; truncation classifies") {
    val m = H264.spsMeta(FixtureGen.h264Bytes(17L)).get
    assert(m.width == 160 + 2 * (17 % 120) && m.height == 180 + 2 * (17 % 100))
    val full = FixtureGen.h264Bytes(17L)
    for (cut <- 1 until full.length by 3)
      H264.spsMeta(full.take(cut)) // never throws; short SPS classifies
  }

  // ---------------- IVF ----------------

  test("ivf: header fields, walked frame chain, lying declared count") {
    val honest = Ivf.encode("VP90", 640, 360, 30, 1, Vector(10, 20, 30), 3)
    val m = Ivf.videoMeta(honest).get
    assert(m.codec == "vp90" && m.width == 640 && m.height == 360)
    assert(m.nFrames == 3 && m.countsAgree && m.durationMs == 3 * 1000 / 30)
    val liar = Ivf.encode("AV01", 320, 180, 30, 1, Vector(10, 20), 9)
    val lm = Ivf.videoMeta(liar).get
    assert(lm.nFrames == 2 && lm.declaredFrames == 9 && !lm.countsAgree)
    // truncation mid-frame classifies
    assert(Ivf.videoMeta(honest.dropRight(5)).isEmpty)
    assert(Ivf.videoMeta(honest.take(31)).isEmpty)
  }

  // ---------------- VP9 keyframe header ----------------

  test("vp9: keyframe header round-trip; bitstream dims beat a lying container") {
    val hdr = graft.functions.Vp9.encodeKeyframeHeader(1920, 1080, colorSpace = 2)
    val m = graft.functions.Vp9.keyframeMeta(hdr).get
    assert(m.width == 1920 && m.height == 1080 && m.profile == 0)
    assert(m.bitDepth == 8 && m.colorSpace == 2 &&
      m.subsamplingX == 1 && m.subsamplingY == 1)
    // wrong sync code classifies
    val bad = hdr.clone(); bad(2) = (bad(2) ^ 0x10).toByte
    assert(graft.functions.Vp9.keyframeMeta(bad).isEmpty)
    // lying container: bitstream wins, the lie is flagged
    val lying = FixtureGen.ivfVp9Bytes(10L) // d%5==0 -> container width lies
    val (kf, agrees) = graft.functions.Vp9.fromIvf(lying).get
    assert(!agrees && kf.width == 176 + 2 * (10 % 160))
    val honest = FixtureGen.ivfVp9Bytes(11L)
    assert(graft.functions.Vp9.fromIvf(honest).get._2)
    // triage reports the BITSTREAM dims for the lying container
    val tri = MediaMeta.describe(lying)
    assert(tri.container == "ivf" && tri.width == 176 + 2 * (10 % 160))
  }

  // ---------------- AV1 sequence header ----------------

  test("av1: both header shapes round-trip; variable-width dims; lying container") {
    for (reduced <- Seq(true, false); (w, h) <- Seq((1920, 1080), (17, 3000))) {
      val obu = graft.functions.Av1.encodeSeqObu(0, 13, w, h, reduced)
      val m = graft.functions.Av1.seqMeta(obu).get
      assert((m.width, m.height) == ((w, h)), s"reduced=$reduced ${w}x$h")
      assert(m.levelIdx == 13 && m.reducedHeader == reduced)
    }
    // the temporal delimiter is skipped by the OBU walk, and a corrupt
    // leb128 size classifies
    val obu = graft.functions.Av1.encodeSeqObu(2, 5, 640, 360, reduced = false)
    assert(obu(0) == 0x12, "fixture leads with a temporal delimiter")
    val bad = obu.clone(); bad(3) = 0x7f // sequence OBU size now lies
    assert(graft.functions.Av1.seqMeta(bad).isEmpty)
    // lying container flagged; bitstream wins incl. in the triage
    val lying = FixtureGen.ivfAv1Bytes(14L) // d%7==0 -> container height lies
    val (sm, agrees) = graft.functions.Av1.fromIvf(lying).get
    assert(!agrees && sm.height == 96 + 2 * (14 % 140))
    assert(MediaMeta.describe(lying).height == 96 + 2 * (14 % 140))
    assert(graft.functions.Av1.fromIvf(FixtureGen.ivfAv1Bytes(15L)).get._2)
  }

  // ---------------- fixture closed forms + triage ----------------

  test("fixture closed forms: every oracle column, docIds 0..120") {
    for (d <- 0L to 120L) {
      val a = Aac.audioMeta(FixtureGen.aacBytes(d)).get
      assert(a.profile == Aac.Profiles((d % 4).toInt))
      assert(a.sampleRate == Aac.SampleRates((d % 9).toInt))
      assert(a.channels == 1 + d % 5 && a.nFrames == 3 + d % 6)
      assert(a.crcProtected == (d % 5 == 0))
      assert(a.durationMs == (3 + d % 6) * 1024L * 1000L / a.sampleRate)

      val h = H264.spsMeta(FixtureGen.h264Bytes(d)).get
      assert(h.width == 160 + 2 * (d % 120) && h.height == 180 + 2 * (d % 100))
      assert(h.profileIdc == 66 && h.levelIdc == 30 + d % 21)

      val v = Ivf.videoMeta(FixtureGen.ivfBytes(d)).get
      assert(v.nFrames == 2 + d % 7 && v.countsAgree == (d % 6 != 0))
      assert(v.width == 320 + 2 * (d % 200) && v.height == 180 + 2 * (d % 150))

      val (kf, agrees) = graft.functions.Vp9.fromIvf(FixtureGen.ivfVp9Bytes(d)).get
      assert(kf.width == 176 + 2 * (d % 160) && kf.height == 144 + 2 * (d % 120))
      assert(kf.colorSpace == 1 + d % 5 && agrees == (d % 5 != 0))

      val (av, aok) = graft.functions.Av1.fromIvf(FixtureGen.ivfAv1Bytes(d)).get
      assert(av.width == 128 + 2 * (d % 180) && av.height == 96 + 2 * (d % 140))
      assert(av.profile == d % 3 && av.levelIdx == d % 24 &&
        av.reducedHeader == (d % 2 == 0) && aok == (d % 7 != 0))
    }
  }

  test("triage routes the three new families; ICO magic is not shadowed") {
    val ivf = MediaMeta.describe(FixtureGen.ivfBytes(5L))
    assert(ivf.kind == "video" && ivf.container == "ivf" && ivf.codec == "av01")
    val h264 = MediaMeta.describe(FixtureGen.h264Bytes(5L))
    assert(h264.kind == "video" && h264.container == "h264")
    assert(h264.width == 160 + 2 * 5 && h264.height == 180 + 2 * 5)
    val aac = MediaMeta.describe(FixtureGen.aacBytes(5L))
    assert(aac.kind == "audio" && aac.container == "adts" &&
      aac.codec == "aac_" + Aac.Profiles(1))
    // ICO (00 00 01 00) still routes as ICO, not as a 3-byte AVC start code
    val ico = MediaMeta.describe(FixtureGen.icoBytes(5L))
    assert(ico.container == "ico")
  }
}
