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

  test("MS ADPCM: hand-stepped reference vector (2-tap LPC + delta adaptation)") {
    // independent hand computation, coefficient pair 1 (512, −256):
    //   hdr (Δ20, s1 100, s2 60) → frames 60, 100
    //   nib 2  → ((100·512 − 60·256)>>8 = 140) + 2·20 = 180, Δ (230·20)>>8 = 17
    //   nib 14 → ((180·512 − 100·256)>>8 = 260) − 2·17 = 226, Δ (230·17)>>8 = 15 → 16
    //   nib 0  → ((226·512 − 180·256)>>8 = 272) + 0,          Δ stays 16 (floor)
    //   nib 4  → ((272·512 − 226·256)>>8 = 318) + 4·16 = 382
    val bytes = Wav.encodeMsAdpcm(
      Seq(Wav.MsBlock(Seq(Wav.MsChan(1, 20, 100, 60)), Array(2, 14, 0, 4))), 8000)
    assert(Wav.samples(bytes).get.toSeq == Seq(60, 100, 180, 226, 272, 382))
    val f = Wav.features(bytes).get
    assert(f.audioFormat == 2 && f.bitsPerSample == 4 && f.nFrames == 6)
    assert(f.peak == 382)
  }

  test("MS ADPCM: negative prediction sums FLOOR (arithmetic >>8, not a divide)") {
    // pair 5 (460, −208), s1=−1, s2=3: sum = −460 − 624 = −1084, and
    // −1084 >> 8 floors to −5 (truncating division would give −4); the
    // next step's sum is −5·460 + (−1)·(−208) = −2092 >> 8 = −9
    val bytes = Wav.encodeMsAdpcm(
      Seq(Wav.MsBlock(Seq(Wav.MsChan(5, 16, -1, 3)), Array(0, 0))), 8000)
    assert(Wav.samples(bytes).get.toSeq == Seq(3, -1, -5, -9))
  }

  test("MS ADPCM: fixture patterns decode to the closed form (order, clamps, stereo)") {
    // the same closed-form signal the q44 DuckDB oracle regenerates
    def model(d: Long): Seq[Int] = {
      val pat = (d % 3).toInt
      val pv = ((d * 113) % 18000 - 9000).toInt
      val nib = 50 + 2 * (d % 25).toInt
      val p1 = (20000 + (d % 100) * 97).toInt
      val st = (300 + (d % 50) * 23).toInt
      val nf = 40 + (d % 20).toInt
      val dl = (64 + d % 32).toInt
      val dr = (48 + d % 16).toInt
      val spb = if (pat == 2) nf + 2 else nib + 2
      val ch = if (pat == 2) 2 else 1
      for { b <- 0 until 2; k <- 0 until spb; c <- 0 until ch } yield {
        val sg = if (b == 0) 1 else -1
        pat match {
          case 0 => sg * pv + (if (k == 0) 0 else 9)
          case 1 => if (b == 0) math.min(p1 + st * k, 32767)
                    else math.max(-p1 - st * k, -32768)
          case _ =>
            if (c == 0) sg * pv + (if (k == 0) 0 else if (k == 1) 11 else 11 + 4 * dl)
            else -sg * pv + (if (k == 0) 0 else if (k == 1) 5 else 5 - 4 * dr)
        }
      }
    }
    (0L until 60L).foreach { d =>
      val bytes = FixtureGen.msAdpcmBytes(d)
      assert(Wav.samples(bytes).get.toSeq == model(d), s"doc $d")
      val f = Wav.features(bytes).get
      val spb = if (d % 3 == 2) 40 + (d % 20).toInt + 2 else 50 + 2 * (d % 25).toInt + 2
      assert(f.nFrames == 2 * spb, s"doc $d")
      assert(f.channels == (if (d % 3 == 2) 2 else 1), s"doc $d")
    }
  }

  test("MS ADPCM: extensionless fmt defaults spb; hostile bpred clamps to the table") {
    val plain = Wav.encodeMsAdpcm(
      Seq(Wav.MsBlock(Seq(Wav.MsChan(0, 16, 70, 30)), Array(0, 0))), 8000)
    // strip the 34-byte fmt extension (cbSize + spb + numCoef + 7 pairs):
    // the decoder must fall back to the STANDARD coefficient table and the
    // everything-past-the-header spb default
    def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)
    def u32le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmtBody = java.util.Arrays.copyOfRange(plain, 20, 36) // first 16 bytes
    val dataChunk = java.util.Arrays.copyOfRange(plain, 70, plain.length) // after the 50-byte fmt
    val body = ascii("fmt ") ++ u32le(16) ++ fmtBody ++ dataChunk
    val bytes = ascii("RIFF") ++ u32le(4 + body.length) ++ ascii("WAVE") ++ body
    assert(Wav.samples(bytes).get.toSeq == Seq(30, 70, 70, 70)) // pair 0: constant
    // bpred 200 indexes past the 7-entry table → clamp to the LAST pair
    // (392, −232), decode deterministically, never throw
    val hostile = plain.clone()
    hostile(78) = 200.toByte // data payload starts at 70+8; byte 0 is bpred
    val got = Wav.samples(hostile).get
    assert(got.length == 4 && got(0) == 30 && got(1) == 70)
    assert(got(2) == ((70 * 392 + 30 * -232) >> 8)) // pair 6 prediction = 80
    assert(got(3) == ((got(2) * 392 + 70 * -232) >> 8))
  }

  test("MS ADPCM: truncated payload decodes the complete prefix, never throws") {
    val full = FixtureGen.msAdpcmBytes(1L) // pattern 1: two ramp blocks
    val fullSamples = Wav.samples(full).get.toSeq
    val cut = Wav.samples(full.dropRight(6)).get.toSeq
    assert(cut.length < fullSamples.length && fullSamples.startsWith(cut))
    // cut inside block 2's 7-byte header: block 2 contributes nothing
    val nib = 50 + 2 * (1 % 25)
    val cutHdr = Wav.samples(full.take(full.length - nib / 2 - 3)).get.toSeq
    assert(cutHdr == fullSamples.take(nib + 2))
    // degenerate blockAlign (< the 7-byte header) classifies
    val bad = full.clone(); bad(32) = 6; bad(33) = 0 // fmt.blockAlign := 6
    assert(Wav.features(bad).isEmpty)
    // 3+ channels are outside the spec's interleave definition → classify
    val tri = full.clone(); tri(22) = 3 // fmt.channels := 3
    assert(Wav.features(tri).isEmpty)
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
