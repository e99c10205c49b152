package graft

import java.nio.charset.StandardCharsets

import graft.functions.{AudioContainers, Flac, Wav}
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** X1 — REAL entropy-coded audio decode (FLAC): Rice residuals, fixed +
  * LPC prediction, CRC-8/16 verification, channel decorrelation, wasted
  * bits — against hand-assembled bitstreams (independent of the
  * encoder), published CRC check values, and closed-form fixtures. */
class FlacSpec extends AnyFunSuite {

  // -- external pins ---------------------------------------------------

  test("CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) match published check values") {
    val check = "123456789".getBytes(StandardCharsets.US_ASCII)
    assert(Flac.crc8(check, 0, check.length) == 0xf4)   // CRC-8/SMBUS
    assert(Flac.crc16(check, 0, check.length) == 0xfee8) // CRC-16/UMTS
  }

  // -- hand-assembled bitstreams (decoder-independent expectations) -----

  /** "fLaC" + a last-block STREAMINFO: mono, 8 bps, blockSize 16,
    * 8000 Hz, 16 total samples. */
  private def handStreamInfo(w: Flac.BitWriter): Unit = {
    "fLaC".foreach(c => w.u(8, c.toLong))
    w.u(1, 1); w.u(7, 0); w.u(24, 34)
    w.u(16, 16); w.u(16, 16) // min/max block size
    w.u(24, 0); w.u(24, 0)
    w.u(20, 8000); w.u(3, 0); w.u(5, 7) // mono, bps 8
    w.u(36, 16)
    (0 until 4).foreach(_ => w.u(32, 0)) // md5 unknown
  }

  /** Frame header for the hand streams: fixed blocking, frame 0,
    * blockSize via code 6 (8-bit, uncommon), sr code 4 (8000), mono,
    * size code 1 (8 bps), then CRC-8 computed with the PINNED function. */
  private def handFrameHeader(w: Flac.BitWriter): Int = {
    val frameStart = w.snapshot().length
    w.u(14, 0x3ffe); w.u(1, 0); w.u(1, 0)
    w.u(4, 6); w.u(4, 4); w.u(4, 0); w.u(3, 1); w.u(1, 0)
    w.u(8, 0)  // coded frame number 0
    w.u(8, 15) // blockSize - 1
    val bytes = w.snapshot()
    w.u(8, Flac.crc8(bytes, frameStart, bytes.length).toLong)
    frameStart
  }

  private def handFrameFooter(w: Flac.BitWriter, frameStart: Int): Unit = {
    w.align()
    val bytes = w.snapshot()
    w.u(16, Flac.crc16(bytes, frameStart, bytes.length).toLong)
  }

  test("hand-assembled fixed-order-1 frame: Rice bits decode to the hand-stepped ramp") {
    // subframe: fixed order 1, warmup 10, then 15 residuals of +1 coded
    // with Rice parameter 1 — zigzag(+1)=2, quotient 1, remainder 0, so
    // each residual is the bit string "010" BY HAND, not by the encoder
    val w = new Flac.BitWriter
    handStreamInfo(w)
    val fs = handFrameHeader(w)
    w.u(1, 0); w.u(6, 9); w.u(1, 0) // pad, type fixed-1, no wasted bits
    w.u(8, 10)                      // warmup sample
    w.u(2, 0); w.u(4, 0)            // Rice method 0, partition order 0
    w.u(4, 1)                       // Rice parameter 1
    (0 until 15).foreach(_ => w.u(3, 2)) // "010" per residual
    handFrameFooter(w, fs)
    val bytes = w.result()
    assert(Flac.samples(bytes).get.toSeq == (10 to 25)) // x[n] = x[n-1] + 1
    val f = Flac.features(bytes).get
    assert(f.nFrames == 16 && f.peak == 25 && f.audioFormat == Flac.FormatTag)
    // any single flipped bit inside the frame must classify, not lie
    val flipped = bytes.clone()
    flipped(bytes.length - 5) = (flipped(bytes.length - 5) ^ 0x10).toByte
    assert(Flac.features(flipped).isEmpty)
  }

  test("hand-assembled wasted-bits constant subframe: value shifts left by k") {
    // wasted flag 1 then unary "01" → k = 2; constant coded in 8−2 = 6
    // bits as 5 → every decoded sample is 5 << 2 = 20
    val w = new Flac.BitWriter
    handStreamInfo(w)
    val fs = handFrameHeader(w)
    w.u(1, 0); w.u(6, 0); w.u(1, 1) // pad, type constant, wasted flag
    w.u(2, 1)                       // unary: one 0 then the 1 → k = 2
    w.u(6, 5)                       // constant in eBps = 6 bits
    handFrameFooter(w, fs)
    assert(Flac.samples(w.result()).get.toSeq == Seq.fill(16)(20))
  }

  test("hand-assembled negative Rice residuals: zig-zag unfold is the spec's") {
    // fixed order 1, warmup 0, residuals −1 each: zigzag(−1) = 1 →
    // param 0: quotient 1 (bits "01"), no remainder → samples 0,−1,…,−15
    val w = new Flac.BitWriter
    handStreamInfo(w)
    val fs = handFrameHeader(w)
    w.u(1, 0); w.u(6, 9); w.u(1, 0)
    w.u(8, 0)
    w.u(2, 0); w.u(4, 0); w.u(4, 0)
    (0 until 15).foreach(_ => w.u(2, 1)) // "01" per residual
    handFrameFooter(w, fs)
    assert(Flac.samples(w.result()).get.toSeq == (0 to 15).map(-_))
  }

  // -- encoder round trips for every subframe/assignment class ----------

  test("stereo left/side and right/side reconstruct the spec's undo shapes") {
    val b = 16
    val ramp = Array.tabulate(b)(k => 100L + 7L * k)
    val side = Array.fill(b)(30L)
    val ls = Flac.encodeFlac(Seq(Flac.Frame(8,
      Seq(Flac.SubFixed(1, ramp), Flac.SubConstant(30, b)))), 8000, 16)
    assert(Flac.samples(ls).get.toSeq ==
      (0 until b).flatMap(k => Seq(ramp(k).toInt, (ramp(k) - side(k)).toInt)))
    val rs = Flac.encodeFlac(Seq(Flac.Frame(9,
      Seq(Flac.SubConstant(30, b), Flac.SubFixed(1, ramp)))), 8000, 16)
    assert(Flac.samples(rs).get.toSeq ==
      (0 until b).flatMap(k => Seq((side(k) + ramp(k)).toInt, ramp(k).toInt)))
    val f = Flac.features(ls).get
    assert(f.channels == 2 && f.nFrames == b)
  }

  test("mid/side with an ODD side value exercises the reinjected low bit") {
    // left = 11, right = 4 → mid = (11+4)>>1 = 7, side = 7; the decoder
    // must rebuild mid<<1 | (side&1) = 15 to recover 11/4 exactly
    val b = 16
    val enc = Flac.encodeFlac(Seq(Flac.Frame(10,
      Seq(Flac.SubConstant(7, b), Flac.SubConstant(7, b)))), 8000, 16)
    assert(Flac.samples(enc).get.toSeq == (0 until b).flatMap(_ => Seq(11, 4)))
  }

  test("escape-coded partitions (raw bits) and Rice2 (5-bit params) round-trip") {
    // a huge outlier makes the optimal coding escape or Rice2 — both are
    // decode paths Rice-method-0 fixtures never touch
    val wild = Array.tabulate(32)(k => if (k == 7) (1L << 29) else k.toLong - 16L)
    val enc = Flac.encodeFlac(
      Seq(Flac.Frame(0, Seq(Flac.SubFixed(0, wild)))), 8000, 32)
    assert(Flac.samples(enc).get.map(_.toLong).toSeq == wild.toSeq)
  }

  test("multi-byte coded frame numbers: 130-frame stream re-syncs every frame") {
    val frames = (0 until 130).map(i =>
      Flac.Frame(0, Seq(Flac.SubConstant((i % 64).toLong, 16))))
    val enc = Flac.encodeFlac(frames, 8000, 16)
    val got = Flac.samples(enc).get
    assert(got.length == 130 * 16)
    assert((0 until 130).forall(i => got(i * 16) == i % 64))
  }

  test("LPC subframe: quantized-coefficient prediction is exact integer math") {
    // coef −32, shift 5 → x[n] = −x[n−1] exactly; alternating signal has
    // all-zero residuals, so ONLY the predictor reconstructs the tail
    val xs = Array.tabulate(20)(k => if (k % 2 == 0) 1234L else -1234L)
    val enc = Flac.encodeFlac(
      Seq(Flac.Frame(0, Seq(Flac.SubLpc(Array(-32), 5, 6, xs)))), 8000, 16)
    assert(Flac.samples(enc).get.map(_.toLong).toSeq == xs.toSeq)
  }

  // -- fixture closed form (the q40 oracle's model) ----------------------

  test("fixture patterns decode to the closed form the q40 oracle regenerates") {
    def model(d: Long): Seq[Long] = {
      val b = 64 + 2 * (d % 16).toInt
      val p = ((d * 97) % 16000 - 8000)
      (0 until 2).flatMap { blk =>
        val s0 = if (blk == 0) p else -p
        (0 until b).flatMap { k =>
          (d % 4) match {
            case 0 => Seq(s0)
            case 1 => Seq(s0 + 3 * k)
            case 2 => Seq(if (k % 2 == 0) s0 else -s0)
            case _ => Seq(s0 + 2 * k, s0 - 2 * k)
          }
        }
      }
    }
    (0L until 12L).foreach { d =>
      val bytes = FixtureGen.flacBytes(d)
      assert(Flac.samples(bytes).get.map(_.toLong).toSeq == model(d), s"doc $d")
      val f = Flac.features(bytes).get
      assert(f.nFrames == 2 * (64 + 2 * (d % 16).toInt), s"doc $d")
      assert(f.channels == (if (d % 4 == 3) 2 else 1), s"doc $d")
      assert(f.sampleRate == 8000 && f.bitsPerSample == 16, s"doc $d")
    }
  }

  // -- dispatch + hostile payloads ---------------------------------------

  test("AudioContainers sniffs FLAC vs RIFF by magic, not by a trusted column") {
    val flac = FixtureGen.flacBytes(1L)
    val wav = FixtureGen.wavBytes(1L)
    assert(AudioContainers.features(flac).get.audioFormat == Flac.FormatTag)
    assert(AudioContainers.features(wav).get.audioFormat == 1)
    assert(AudioContainers.features("fLaX garbage".getBytes).isEmpty)
    assert(AudioContainers.features(null).isEmpty)
    assert(AudioContainers.samples(flac).get.toSeq ==
      Flac.samples(flac).get.toSeq)
  }

  test("a frame whose size code contradicts STREAMINFO classifies (features would mis-scale)") {
    // STREAMINFO says bps 8; the frame claims szCode 4 (16-bit) — the
    // spec requires agreement, and features report STREAMINFO's values
    val w = new Flac.BitWriter
    handStreamInfo(w)
    val frameStart = w.snapshot().length
    w.u(14, 0x3ffe); w.u(1, 0); w.u(1, 0)
    w.u(4, 6); w.u(4, 4); w.u(4, 0); w.u(3, 4); w.u(1, 0) // szCode 4 = 16-bit
    w.u(8, 0); w.u(8, 15)
    val hdr = w.snapshot()
    w.u(8, Flac.crc8(hdr, frameStart, hdr.length).toLong)
    w.u(1, 0); w.u(6, 0); w.u(1, 0); w.u(16, 10) // constant subframe, 16-bit
    handFrameFooter(w, frameStart)
    assert(Flac.features(w.result()).isEmpty)
  }

  test("encoder bounds: oversized blocks are loud; a full-scale bps-32 minimum classifies") {
    intercept[IllegalArgumentException] { // 16-bit header code cannot carry 70000
      Flac.encodeFlac(Seq(Flac.Frame(0,
        Seq(Flac.SubVerbatim(new Array[Long](70000))))), 8000, 16)
    }
    // Int.MinValue would make math.abs negative in the peak fold — decode
    // rejects that single value rather than corrupt features
    val enc = Flac.encodeFlac(Seq(Flac.Frame(0,
      Seq(Flac.SubConstant(Int.MinValue.toLong, 16)))), 8000, 32)
    assert(Flac.features(enc).isEmpty)
    val ok = Flac.encodeFlac(Seq(Flac.Frame(0,
      Seq(Flac.SubConstant(Int.MinValue.toLong + 1, 16)))), 8000, 32)
    assert(Flac.features(ok).get.peak == Int.MaxValue)
  }

  test("truncated / malformed payloads classify (None), never throw") {
    val full = FixtureGen.flacBytes(5L)
    (1 to 40 by 7).foreach { cut =>
      assert(Flac.features(full.dropRight(cut)).isEmpty, s"cut $cut")
    }
    assert(Flac.features(Array.emptyByteArray).isEmpty)
    assert(Flac.features("fLaC".getBytes).isEmpty)
    assert(Flac.features(Wav.encodePcm16Mono(Array(1, 2, 3), 8000)).isEmpty)
  }
}
