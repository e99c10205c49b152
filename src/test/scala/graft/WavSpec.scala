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

  test("IMA ADPCM: hand-stepped reference vector (adaptive step walk)") {
    // independent hand computation through three step sizes:
    //   idx 0 (step 7),  nib 7  → diff 0+7+3+1=11,  p 11,  idx 8
    //   idx 8 (step 16), nib 7  → diff 2+16+8+4=30, p 41,  idx 16
    //   idx 16 (step 34), nib 3 → diff 4+17+8=29,   p 70,  idx 15
    //   idx 15 (step 31), nib 0xB → diff 3+15+7=25, SIGN → p 45, idx 14
    val bytes = Wav.encodeAdpcmMono(
      Seq(Wav.AdpcmBlock(0, 0, Array(7, 7, 3, 0xb))), 8000)
    assert(Wav.samples(bytes).get.toSeq == Seq(0, 11, 41, 70, 45))
    val f = Wav.features(bytes).get
    assert(f.audioFormat == 0x11 && f.bitsPerSample == 4 && f.nFrames == 5)
    assert(f.peak == 70)
  }

  test("IMA ADPCM: fixture patterns decode to the closed form (block reseed + clamps)") {
    // the same closed-form signal the q39 DuckDB oracle regenerates
    def model(d: Long): Seq[Int] = {
      val nib = 60 + 2 * (d % 20).toInt
      val p = ((d * 131) % 20000 - 10000).toInt
      (0 until 2).flatMap { blk =>
        val p0 = if (blk == 0) p else -p
        (0 to nib).map { k =>
          (d % 3) match {
            case 0 =>
              if (blk == 0) p0 + 4 * k
              else p0 + (if (k == 0) 0 else if (k == 1) 7 else 6 + 4 * k)
            case 1 => if (k == 0) p0 else if (k % 2 == 1) 32767 else -28669
            case _ => p0
          }
        }
      }
    }
    (0L until 9L).foreach { d =>
      val bytes = FixtureGen.adpcmBytes(d)
      assert(Wav.samples(bytes).get.toSeq == model(d), s"doc $d")
      val f = Wav.features(bytes).get
      assert(f.nFrames == 2 * (60 + 2 * (d % 20).toInt + 1), s"doc $d")
    }
  }

  test("IMA ADPCM: stereo decodes 4-byte-interleaved groups; extensionless fmt defaults spb") {
    // hand-built stereo block, 16-byte fmt (NO cbSize/samplesPerBlock —
    // the decoder must default to everything-past-the-headers): ch0
    // header (100, idx 0) + nibbles all 0 (step 7 → diff 0: constant);
    // ch1 header (-200, idx 0) + nibbles all 3 (ramp +4)
    def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)
    def u32le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val fmt = ascii("fmt ") ++ u32le(16) ++ u16le(0x11) ++ u16le(2) ++ u32le(8000) ++
      u32le(8000) ++ u16le(16) ++ u16le(4) // blockAlign 16 = 2×(4 hdr + 4 data)
    val block = u16le(100) ++ u16le(0) ++ u16le(0xff38) ++ u16le(0) ++ // -200 = 0xff38
      Array.fill[Byte](4)(0x00) ++ Array.fill[Byte](4)(0x33)
    val data = ascii("data") ++ u32le(block.length) ++ block
    val body = fmt ++ data
    val bytes = ascii("RIFF") ++ u32le(4 + body.length) ++ ascii("WAVE") ++ body
    val f = Wav.features(bytes).get
    assert(f.channels == 2 && f.nFrames == 9) // header frame + 8 per group
    val out = Wav.samples(bytes).get.toSeq
    assert(out == (0 to 8).flatMap(k => Seq(100, -200 + 4 * k)))
  }

  test("IMA ADPCM: RIFF size field is file length minus 8 (strict readers bound by it)") {
    // this parser walks chunks without trusting the RIFF size, so only an
    // external strict reader would catch an undersized field — pin it
    (0L until 6L).foreach { d =>
      val b = FixtureGen.adpcmBytes(d)
      val declared = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
        ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
      assert(declared == b.length - 8, s"doc $d: declared $declared len ${b.length}")
    }
  }

  test("IMA ADPCM: truncated payload decodes the complete prefix, never throws") {
    val full = FixtureGen.adpcmBytes(3L) // pattern 0: ramp
    val fullSamples = Wav.samples(full).get.toSeq
    val nib = 60 + 2 * (3 % 20)
    // cut mid-block-2: drops trailing nibbles but keeps its header
    val cut = Wav.samples(full.dropRight(10)).get.toSeq
    assert(cut.length < fullSamples.length && cut.length > nib + 1)
    assert(fullSamples.startsWith(cut))
    // cut inside block 2's header: block 2 contributes nothing
    val cutHdr = Wav.samples(full.take(full.length - (nib / 2) - 2)).get.toSeq
    assert(cutHdr == fullSamples.take(nib + 1))
    // degenerate blockAlign (< header+1 byte) classifies
    val bad = full.clone(); bad(32) = 4; bad(33) = 0 // fmt.blockAlign := 4
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
