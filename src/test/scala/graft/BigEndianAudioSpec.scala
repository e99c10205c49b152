package graft

import java.nio.charset.StandardCharsets

import graft.functions.{Aiff, Au, AudioContainers, Wav}
import graft.fixtures.FixtureGen

/** X1 — REAL decode for the big-endian audio containers: AIFF's 80-bit
  * extended-precision sample rate (the format's one tricky field), the
  * IFF chunk walk, signed 8-bit PCM (both formats — the opposite of
  * WAV), AU's variable data offset, and the AudioContainers dispatch. */
class BigEndianAudioSpec extends SparkSpec {

  private def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)
  private def u32be(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u16be(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("extended80: canonical published byte vectors for 8000 and 44100 Hz") {
    // 8000 = 1.953125·2^12 → exp 0x400B, mantissa FA00…; 44100 → 0x400E AC44…
    val e8000 = Aiff.extended80Of(8000)
    assert(e8000.toSeq == Seq(0x40, 0x0b, 0xfa, 0, 0, 0, 0, 0, 0, 0).map(_.toByte))
    val e44100 = Aiff.extended80Of(44100)
    assert(e44100.toSeq == Seq(0x40, 0x0e, 0xac, 0x44, 0, 0, 0, 0, 0, 0).map(_.toByte))
    assert(Aiff.extended80(e8000, 0) == 8000.0)
    assert(Aiff.extended80(e44100, 0) == 44100.0)
  }

  test("extended80: exact round-trip across the audible-rate range; sign and zero") {
    Seq(1, 7, 8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000,
      192000, 1234567).foreach { r =>
      assert(Aiff.extended80(Aiff.extended80Of(r), 0) == r.toDouble, s"rate $r")
    }
    // the mantissa is UNSIGNED: every normalized value has bit 63 set, so
    // a signed-Long conversion would flip all real rates negative
    val zero = new Array[Byte](10)
    assert(Aiff.extended80(zero, 0) == 0.0)
    val neg = Aiff.extended80Of(8000).clone()
    neg(0) = (neg(0) | 0x80).toByte // sign bit
    assert(Aiff.extended80(neg, 0) == -8000.0)
  }

  test("aiff: encode → features round-trip; 16-bit BE sample math") {
    val bytes = Aiff.encodePcm16Mono(Array(1000, -1000, 32767, -32768), 22050)
    val f = Aiff.features(bytes).get
    assert(f.channels == 1 && f.sampleRate == 22050 && f.bitsPerSample == 16)
    assert(f.nFrames == 4 && f.peak == 32768)
    assert(Aiff.samples(bytes).get.toSeq == Seq(1000, -1000, 32767, -32768))
  }

  test("aiff: 8-bit PCM is SIGNED (unlike WAV); hand-built container") {
    val comm = ascii("COMM") ++ u32be(18) ++ u16be(1) ++ u32be(3) ++ u16be(8) ++
      Aiff.extended80Of(8000)
    val ssnd = ascii("SSND") ++ u32be(8 + 3 + 1) ++ u32be(0) ++ u32be(0) ++
      Array[Byte](100, -100, -128, 0) // 3 samples + pad
    val body = comm ++ ssnd
    val bytes = ascii("FORM") ++ u32be(4 + body.length) ++ ascii("AIFF") ++ body
    assert(Aiff.samples(bytes).get.toSeq == Seq(100, -100, -128))
  }

  test("aiff: SSND offset field skips fill bytes before the first frame") {
    val comm = ascii("COMM") ++ u32be(18) ++ u16be(1) ++ u32be(2) ++ u16be(16) ++
      Aiff.extended80Of(8000)
    // 4 bytes of block-align fill before the samples
    val ssnd = ascii("SSND") ++ u32be(8 + 4 + 4) ++ u32be(4) ++ u32be(0) ++
      Array[Byte](9, 9, 9, 9) ++ u16be(500) ++ u16be(0xfe0c) // 500, -500
    val body = comm ++ ssnd
    val bytes = ascii("FORM") ++ u32be(4 + body.length) ++ ascii("AIFF") ++ body
    assert(Aiff.samples(bytes).get.toSeq == Seq(500, -500))
  }

  test("au: variable data offset, unknown-size sentinel, signed 8-bit linear") {
    val au = Au.encodeMono(Array[Byte](100, -100, -128, 0), 16000, encoding = 2,
      annotation = 12)
    assert(Au.samples(au).get.toSeq == Seq(100, -100, -128, 0))
    val f = Au.features(au).get
    assert(f.sampleRate == 16000 && f.audioFormat == 1 && f.peak == 128)
    // dataSize 0xFFFFFFFF means "until EOF"
    val eof = au.clone()
    (0 until 4).foreach(j => eof(8 + j) = 0xff.toByte)
    assert(Au.samples(eof).get.toSeq == Seq(100, -100, -128, 0))
    // 16-bit BE PCM
    val au16 = Au.encodeMono(u16be(300) ++ u16be(0xfed4), 8000, encoding = 3)
    assert(Au.samples(au16).get.toSeq == Seq(300, -300))
  }

  test("au: G.711 expansion matches Wav's tables through the AU path") {
    (0 until 256 by 7).foreach { b0 =>
      val mu = Au.samples(Au.encodeMono(Array(b0.toByte), 8000, 1)).get
      assert(mu.toSeq == Seq(Wav.ulaw2linear(b0)), s"ulaw $b0")
      val al = Au.samples(Au.encodeMono(Array(b0.toByte), 8000, 27)).get
      assert(al.toSeq == Seq(Wav.alaw2linear(b0)), s"alaw $b0")
    }
  }

  test("fixture: closed form holds through the AudioContainers dispatch") {
    (0L until 24L).foreach { d =>
      val bytes = FixtureGen.bigEndianAudioBytes(d)
      val f = AudioContainers.features(bytes).get
      val ss = AudioContainers.samples(bytes).get
        .foldLeft(0L)((a, v) => a + v.toLong * v)
      if (d % 2 == 0) {
        val n = 60 + (d % 40).toInt
        val amp = (900 + (d % 90) * 37).toInt
        assert(f.audioFormat == 1 && f.sampleRate == 8000 + 1000 * (d % 5), s"doc $d")
        assert(f.nFrames == n && f.peak == amp && ss == n.toLong * amp * amp, s"doc $d")
      } else {
        val n = 70 + (d % 30).toInt
        val b0 = ((d * 41) % 256).toInt
        val mag = math.abs(
          if (d % 4 == 1) Wav.ulaw2linear(b0) else Wav.alaw2linear(b0))
        assert(f.audioFormat == (if (d % 4 == 1) 7 else 6), s"doc $d")
        assert(f.nFrames == n && f.peak == mag && ss == n.toLong * mag * mag, s"doc $d")
      }
    }
  }

  test("malformed payloads classify (None), never throw") {
    assert(Aiff.features(null).isEmpty && Au.features(null).isEmpty)
    assert(Aiff.features(ascii("FORMxxxxAIFF")).isEmpty) // no chunks
    assert(Aiff.features(ascii("FORM") ++ u32be(4) ++ ascii("AIFC")).isEmpty) // compressed variant
    assert(Au.features(ascii(".snd")).isEmpty) // header cut short
    val aiff = FixtureGen.bigEndianAudioBytes(0L)
    val au = FixtureGen.bigEndianAudioBytes(1L)
    // truncated AIFF: frames actually present decode (COMM declared count
    // bounds, data bounds harder)
    val cut = Aiff.features(aiff.dropRight(10)).get
    assert(cut.nFrames == 60 - 5)
    // AU data offset pointing past the payload classifies
    val badOff = au.clone()
    badOff(4) = 0x7f.toByte
    assert(Au.features(badOff).isEmpty)
    // unsupported AU encoding (ADPCM variant 23) classifies
    val badEnc = au.clone(); badEnc(15) = 23
    assert(Au.features(badEnc).isEmpty)
    // hostile AIFF chunk size near u32-max clamps, never overflows
    val hostile = aiff.clone()
    hostile(16) = 0xff.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0xfe.toByte
    Aiff.features(hostile) // any outcome but a throw
  }
}
