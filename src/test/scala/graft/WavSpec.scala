package graft

import java.nio.charset.StandardCharsets

import graft.functions.Wav
import graft.fixtures.FixtureGen

/** X1 — REAL audio decode for the codec-free WAV/PCM container: RIFF chunk
  * walking (foreign chunks, padding, truncation), 8/16-bit sample math,
  * feature extraction, and malformed-payload classification. */
class WavSpec extends SparkSpec {

  test("encode → features round-trip: exact peak/rms/duration on a square wave") {
    val bytes = Wav.encodePcm16Mono(Array.tabulate(120)(i => if (i % 2 == 0) 2500 else -2500), 8000)
    val f = Wav.features(bytes).get
    assert(f.channels == 1 && f.sampleRate == 8000 && f.bitsPerSample == 16)
    assert(f.nFrames == 120 && f.peak == 2500)
    assert(f.rms == 2500.0) // every sample² is A² — RMS is A exactly
    assert(f.durationMs == 15L) // 120·1000/8000
    assert(Wav.samples(bytes).get.take(4).toSeq == Seq(2500, -2500, 2500, -2500))
  }

  test("chunk walk: fixture's LIST chunk between fmt and data parses; closed form holds") {
    (0L until 8L).foreach { d =>
      val f = Wav.features(FixtureGen.wavBytes(d)).get
      val amp = 1000 + (d % 100) * 31
      assert(f.nFrames == 100 + (d % 50).toInt, s"doc $d")
      assert(f.peak.toLong == amp && math.round(f.rms) == amp, s"doc $d")
      assert(f.durationMs == (100 + d % 50) * 1000 / 8000, s"doc $d")
    }
  }

  test("8-bit PCM is unsigned-centered; odd-size chunks pad to even") {
    // hand-built: fmt(8-bit mono 4000 Hz) + a 3-byte odd chunk + data
    def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)
    def u32le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val fmt = ascii("fmt ") ++ u32le(16) ++ u16le(1) ++ u16le(1) ++ u32le(4000) ++
      u32le(4000) ++ u16le(1) ++ u16le(8)
    val odd = ascii("junk") ++ u32le(3) ++ Array[Byte](1, 2, 3, 0) // 3 + pad
    val data = ascii("data") ++ u32le(4) ++ Array[Byte](128.toByte, 228.toByte, 28, 128.toByte)
    val body = fmt ++ odd ++ data
    val bytes = ascii("RIFF") ++ u32le(4 + body.length) ++ ascii("WAVE") ++ body
    val f = Wav.features(bytes).get
    assert(f.bitsPerSample == 8 && f.nFrames == 4)
    assert(Wav.samples(bytes).get.toSeq == Seq(0, 100, -100, 0))
    assert(f.peak == 100 && f.rms == math.sqrt(20000.0 / 4))
  }

  test("G.711 expansion is byte-for-byte the JDK javax.sound converters, both laws") {
    // independent oracle: the JDK ships its own ITU G.711 codecs — run all
    // 256 code bytes through AudioSystem's ULAW/ALAW → PCM_SIGNED
    // conversion and demand exact equality with our integer expansion
    import javax.sound.sampled._
    val raw = Array.tabulate[Byte](256)(_.toByte)
    for ((enc, expand) <- Seq(
        AudioFormat.Encoding.ULAW -> ((b: Int) => Wav.ulaw2linear(b)),
        AudioFormat.Encoding.ALAW -> ((b: Int) => Wav.alaw2linear(b)))) {
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(raw), src, 256)
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val out = AudioSystem.getAudioInputStream(dst, in).readAllBytes()
      (0 until 256).foreach { b =>
        val jdk = ((out(2 * b) & 0xff) | (out(2 * b + 1) << 8)).toShort.toInt
        assert(jdk == expand(b), s"$enc byte $b")
      }
    }
  }

  test("G.711 sign-flip b^0x80 is exact negation under both laws") {
    (0 until 128).foreach { b =>
      assert(Wav.ulaw2linear(b) == -Wav.ulaw2linear(b ^ 0x80), s"ulaw $b")
      assert(Wav.alaw2linear(b) == -Wav.alaw2linear(b ^ 0x80), s"alaw $b")
    }
  }

  test("G.711 fixture: fact-chunk walk + closed-form features, both codecs") {
    (0L until 8L).foreach { d =>
      val f = Wav.features(FixtureGen.g711Bytes(d)).get
      val b0 = ((d * 37) % 256).toInt
      val tag = if (d % 2 == 0) 7 else 6
      val mag = math.abs(if (tag == 7) Wav.ulaw2linear(b0) else Wav.alaw2linear(b0))
      assert(f.audioFormat == tag && f.channels == 1 && f.sampleRate == 8000, s"doc $d")
      assert(f.nFrames == 80 + (d % 40).toInt, s"doc $d")
      assert(f.peak == mag && math.round(f.rms) == mag, s"doc $d")
      // decoded sample stream is the exact ±v square wave
      val head = Wav.samples(FixtureGen.g711Bytes(d)).get.take(4).toSeq
      val v = if (tag == 7) Wav.ulaw2linear(b0) else Wav.alaw2linear(b0)
      assert(head == Seq(v, -v, v, -v), s"doc $d")
    }
  }

  test("G.711 with non-8-bit sample width classifies (None)") {
    val g = FixtureGen.g711Bytes(0L)
    val bad = g.clone(); bad(34) = 16 // fmt.bitsPerSample := 16 under tag 7
    assert(Wav.features(bad).isEmpty)
  }

  test("malformed payloads classify (None), never throw") {
    assert(Wav.features(null).isEmpty)
    assert(Wav.features(Array.emptyByteArray).isEmpty)
    assert(Wav.features("RIFFxxxxWAVE".getBytes(StandardCharsets.US_ASCII)).isEmpty) // no chunks
    assert(Wav.features("not audio at all".getBytes(StandardCharsets.US_ASCII)).isEmpty)
    // compressed (non-PCM) format code → classify, don't decode garbage
    val pcm = Wav.encodePcm16Mono(Array(1000, -1000), 8000)
    val mp3ish = pcm.clone(); mp3ish(20) = 0x55 // fmt.audioFormat := MPEG
    assert(Wav.features(mp3ish).isEmpty)
    // hostile chunk size near u32-max must not overflow the walk
    val hostile = pcm.clone()
    hostile(40) = 0xff.toByte; hostile(41) = 0xff.toByte
    hostile(42) = 0xff.toByte; hostile(43) = 0xfe.toByte
    val hf = Wav.features(hostile) // data claims ~4 GiB; only 4 bytes exist
    assert(hf.forall(_.nFrames <= 2)) // clamped, no throw
    // truncated data: features reflect what's present
    val cut = Wav.features(pcm.dropRight(2)).get
    assert(cut.nFrames == 1 && cut.peak == 1000)
  }
}
