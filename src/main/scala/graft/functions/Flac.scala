package graft.functions

/** Real FLAC decode — the xiph Free Lossless Audio Codec (public spec,
  * RFC 9639 / flac format 2001). Unlike the RIFF family this is a true
  * entropy-coded bitstream: MSB-first bit packing, Rice/Golomb-coded
  * residuals, linear prediction, and per-frame CRCs. Everything the spec
  * defines for decode is implemented in pure JVM integer math:
  *
  *  - magic + metadata-block walk (STREAMINFO required, others skipped)
  *  - frame sync (14-bit code), fixed/variable blocking, UTF-8-style
  *    coded frame numbers, all block-size / sample-rate / sample-size
  *    header codes, CRC-8 header verify (poly 0x07) and CRC-16 frame
  *    verify (poly 0x8005) — a single flipped bit classifies, never lies
  *  - all four subframe types: constant, verbatim, fixed predictors
  *    (orders 0–4), and LPC (orders 1–32, quantized coefficients with
  *    arithmetic-shift prediction in 64-bit accumulation)
  *  - Rice residual partitions, both methods (4-bit and 5-bit
  *    parameters), raw-bits escape codes, zig-zag unfolding
  *  - wasted-bits shifts and all four channel assignments (independent,
  *    left/side, right/side, mid/side — side channels carry +1 bit)
  *
  * Like [[Wav]]/[[Avi]], malformed or truncated payloads classify
  * (`None`), never throw, so decode runs safely per-row inside
  * distributed operators. Only perceptual codecs (mp3/aac) remain
  * stubbed — FLAC needs no codec library, just this bit walk.
  *
  * The inverse surface ([[Flac.encodeFlac]]) writes spec-conformant
  * streams from explicit per-channel subframe plans so fixtures control
  * exactly which decode path a byte exercises (cf. the reference's
  * media fixtures, `tests/converters/test_media.py`-class coverage).
  */
object Flac {

  /** Synthetic `audioFormat` tag for FLAC payloads in [[Wav.Features]]
    * (RIFF fmt tags are 16-bit; this is out-of-band by construction). */
  val FormatTag = 0xf1ac

  private object Bad extends RuntimeException with scala.util.control.NoStackTrace

  // ---------------------------------------------------------------- bits

  /** MSB-first bit reader; any read past the end throws [[Bad]] (caught
    * at the public API boundary → None). */
  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // absolute bit position
    def bitsLeft: Int = bytes.length * 8 - pos
    def bytePos: Int = pos >> 3

    def u(n: Int): Long = {
      var need = n
      var acc = 0L
      while (need > 0) {
        val byteI = pos >> 3
        if (byteI >= bytes.length) throw Bad
        val bitO = pos & 7
        val avail = 8 - bitO
        val take = if (avail < need) avail else need
        val chunk = ((bytes(byteI) & 0xff) >> (avail - take)) & ((1 << take) - 1)
        acc = (acc << take) | chunk
        pos += take
        need -= take
      }
      acc
    }

    /** Signed two's-complement read, n ≥ 1. */
    def s(n: Int): Long = {
      val v = u(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }

    /** Count 0 bits up to the terminating 1 bit (Rice quotient / wasted
      * bits); the terminator is consumed. u(1) throws [[Bad]] at EOF, so
      * an all-zero tail cannot loop forever. */
    def unary(): Int = {
      var q = 0
      while (u(1) == 0L) q += 1
      q
    }

    def align(): Unit = { val r = pos & 7; if (r != 0) pos += 8 - r }
    def skipBytes(n: Int): Unit = {
      if (n < 0 || (pos & 7) != 0) throw Bad
      pos += n * 8
      if (bytePos > bytes.length) throw Bad
    }
  }

  /** MSB-first bit writer (encoder + hand-built spec fixtures). */
  private[graft] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def u(n: Int, v: Long): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt
        nAcc += 1
        if (nAcc == 8) { out.write(acc & 0xff); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (nAcc > 0) u(8 - nAcc, 0)
    def aligned: Boolean = nAcc == 0
    /** Bytes emitted so far; caller must be byte-aligned (CRC spans). */
    def snapshot(): Array[Byte] = { require(aligned, "snapshot mid-byte"); out.toByteArray }
    def result(): Array[Byte] = { align(); out.toByteArray }
  }

  // ---------------------------------------------------------------- CRCs

  /** CRC-8, poly 0x07, init 0 (frame header); spec-pinned against the
    * published check value crc8("123456789") = 0xF4. */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0, unreflected (whole frame); pinned
    * against the published check value crc16("123456789") = 0xFEE8. */
  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- decode

  private final case class StreamInfo(
      minBlock: Int, maxBlock: Int, sampleRate: Int, channels: Int,
      bps: Int, totalSamples: Long)

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array.empty[Int], Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** Decoded interleaved samples + stream facts. */
  final case class Decoded(
      channels: Int, sampleRate: Int, bps: Int, nFrames: Int,
      samples: Array[Int])

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!isFlac(bytes)) return None
    // BitReader positions are Int bit-counts: payloads past 256 MiB would
    // overflow them — classify (no single audio row is that large here)
    if (bytes.length > (1 << 27)) return None
    try {
      val r = new BitReader(bytes)
      r.skipBytes(4) // "fLaC"
      var info: StreamInfo = null
      var last = false
      while (!last) {
        last = r.u(1) == 1L
        val typ = r.u(7).toInt
        val len = r.u(24).toInt
        if (typ == 0) {
          if (len != 34) throw Bad
          val minB = r.u(16).toInt
          val maxB = r.u(16).toInt
          r.u(24); r.u(24) // min/max frame size (informational)
          val sr = r.u(20).toInt
          val ch = r.u(3).toInt + 1
          val bps = r.u(5).toInt + 1
          val total = r.u(36)
          r.skipBytes(16) // md5
          if (sr <= 0) throw Bad
          info = StreamInfo(minB, maxB, sr, ch, bps, total)
        } else r.skipBytes(len)
      }
      if (info == null) throw Bad

      val out = Array.newBuilder[Int]
      var decoded = 0L
      // totalSamples > 0 bounds the walk exactly; 0 means "unknown" →
      // decode until fewer bits remain than the smallest legal frame
      while ((info.totalSamples > 0 && decoded < info.totalSamples) ||
             (info.totalSamples == 0 && r.bitsLeft >= 40)) {
        val frameStart = r.bytePos
        if (r.u(14) != 0x3ffe || r.u(1) != 0L) throw Bad
        r.u(1) // blocking strategy (coded number length differs only at >31-bit counts)
        val bsCode = r.u(4).toInt
        val srCode = r.u(4).toInt
        val assign = r.u(4).toInt
        val szCode = r.u(3).toInt
        if (r.u(1) != 0L) throw Bad
        readCodedNumber(r) // frame/sample number (ordering is positional here)
        val blockSize = bsCode match {
          case 0 => throw Bad
          case 1 => 192
          case c if c <= 5 => 576 << (c - 2)
          case 6 => r.u(8).toInt + 1
          case 7 => r.u(16).toInt + 1
          case c => 256 << (c - 8)
        }
        val sampleRate = srCode match {
          case 0  => info.sampleRate
          case 1  => 88200
          case 2  => 176400
          case 3  => 192000
          case 4  => 8000
          case 5  => 16000
          case 6  => 22050
          case 7  => 24000
          case 8  => 32000
          case 9  => 44100
          case 10 => 48000
          case 11 => 96000
          case 12 => r.u(8).toInt * 1000
          case 13 => r.u(16).toInt
          case 14 => r.u(16).toInt * 10
          case _  => throw Bad
        }
        // the spec requires frame-header overrides to AGREE with
        // STREAMINFO (features report the STREAMINFO values; a frame that
        // contradicts them would silently mis-scale peak/rms/duration)
        if (sampleRate <= 0 || sampleRate != info.sampleRate) throw Bad
        val bps = szCode match {
          case 0 => info.bps
          case 1 => 8
          case 2 => 12
          case 3 => throw Bad
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
        }
        if (bps != info.bps) throw Bad // same STREAMINFO-agreement rule
        if (assign > 10) throw Bad
        val channels = if (assign <= 7) assign + 1 else 2
        if (channels != info.channels) throw Bad
        val headerCrc = r.u(8).toInt
        if (crc8(bytes, frameStart, r.bytePos - 1) != headerCrc) throw Bad

        val chData = Array.ofDim[Array[Long]](channels)
        var c = 0
        while (c < channels) {
          val extra = assign match {
            case 8  => if (c == 1) 1 else 0 // left/side: side stored second
            case 9  => if (c == 0) 1 else 0 // right/side: side stored FIRST
            case 10 => if (c == 1) 1 else 0 // mid/side
            case _  => 0
          }
          chData(c) = readSubframe(r, blockSize, bps + extra)
          c += 1
        }
        r.align()
        val frameCrc = r.u(16).toInt
        if (crc16(bytes, frameStart, r.bytePos - 2) != frameCrc) throw Bad

        // undo stereo decorrelation (libFLAC stream_decoder.c shapes)
        assign match {
          case 8 =>
            var i = 0
            while (i < blockSize) { chData(1)(i) = chData(0)(i) - chData(1)(i); i += 1 }
          case 9 =>
            var i = 0
            while (i < blockSize) { chData(0)(i) = chData(0)(i) + chData(1)(i); i += 1 }
          case 10 =>
            var i = 0
            while (i < blockSize) {
              val side = chData(1)(i)
              val mid2 = (chData(0)(i) << 1) | (side & 1L)
              chData(0)(i) = (mid2 + side) >> 1
              chData(1)(i) = (mid2 - side) >> 1
              i += 1
            }
          case _ => ()
        }
        var i = 0
        while (i < blockSize) {
          var c2 = 0
          while (c2 < channels) {
            val v = chData(c2)(i)
            // reject Int.MinValue too: math.abs(-2^31) is negative, which
            // would corrupt the peak fold downstream (a full-scale bps-32
            // minimum classifies instead — a deliberate 1-value concession)
            if (v > Int.MaxValue || v <= Int.MinValue) throw Bad
            out += v.toInt
            c2 += 1
          }
          i += 1
        }
        decoded += blockSize
        // decompression-bomb bound: constant subframes expand 1 wire
        // sample to a whole block, so output size is NOT proportional to
        // input size even with valid CRCs — cap total expansion
        if (decoded * channels > (1L << 26)) throw Bad
      }
      if (info.totalSamples > 0 && decoded != info.totalSamples) throw Bad
      Some(Decoded(info.channels, info.sampleRate, info.bps,
        decoded.toInt, out.result()))
    } catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: IllegalArgumentException => None
    }
  }

  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.u(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var ones = 1
      while (ones < 8 && (b0 & (0x80 >> ones)) != 0) ones += 1
      if (ones < 2 || ones > 7) throw Bad
      var v: Long = b0 & ((1 << (7 - ones)) - 1)
      var i = 1
      while (i < ones) {
        val c = r.u(8).toInt
        if ((c & 0xc0) != 0x80) throw Bad
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  private def readSubframe(r: BitReader, blockSize: Int, bps: Int): Array[Long] = {
    if (r.u(1) != 0L) throw Bad // mandatory zero pad bit
    val typ = r.u(6).toInt
    val wasted = if (r.u(1) == 1L) r.unary() + 1 else 0
    val eBps = bps - wasted
    if (eBps <= 0) throw Bad
    val x = new Array[Long](blockSize)
    typ match {
      case 0 =>
        val v = r.s(eBps)
        java.util.Arrays.fill(x, v)
      case 1 =>
        var i = 0
        while (i < blockSize) { x(i) = r.s(eBps); i += 1 }
      case t if t >= 8 && t <= 12 =>
        val order = t - 8
        predicted(r, x, blockSize, order, eBps, FixedCoefs(order), 0)
      case t if t >= 32 =>
        val order = t - 31
        if (order > blockSize) throw Bad
        var i = 0
        while (i < order) { x(i) = r.s(eBps); i += 1 }
        val precCode = r.u(4).toInt
        if (precCode == 15) throw Bad
        val precision = precCode + 1
        val shift = r.s(5).toInt
        if (shift < 0) throw Bad // negative shifts are spec-invalid
        val coefs = new Array[Int](order)
        var k = 0
        while (k < order) { coefs(k) = r.s(precision).toInt; k += 1 }
        predictedTail(r, x, blockSize, order, coefs, shift)
      case _ => throw Bad // 2-7, 13-31 reserved
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { x(i) = x(i) << wasted; i += 1 }
    }
    x
  }

  /** Fixed-predictor subframe: warmups then the shared predicted tail
    * (fixed predictors are LPC with unit coefficients and shift 0). */
  private def predicted(r: BitReader, x: Array[Long], blockSize: Int,
      order: Int, bps: Int, coefs: Array[Int], shift: Int): Unit = {
    if (order > blockSize) throw Bad
    var i = 0
    while (i < order) { x(i) = r.s(bps); i += 1 }
    predictedTail(r, x, blockSize, order, coefs, shift)
  }

  private def predictedTail(r: BitReader, x: Array[Long], blockSize: Int,
      order: Int, coefs: Array[Int], shift: Int): Unit = {
    readResiduals(r, x, blockSize, order)
    var n = order
    while (n < blockSize) {
      var sum = 0L
      var i = 0
      while (i < order) { sum += coefs(i).toLong * x(n - 1 - i); i += 1 }
      x(n) = x(n) + (sum >> shift)
      n += 1
    }
  }

  /** Rice-coded residual partitions into x(order until blockSize). */
  private def readResiduals(r: BitReader, x: Array[Long], blockSize: Int,
      order: Int): Unit = {
    val method = r.u(2).toInt
    if (method > 1) throw Bad
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.u(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) throw Bad
    val perPart = blockSize >> po
    var idx = order
    var j = 0
    while (j < parts) {
      val count = perPart - (if (j == 0) order else 0)
      if (count < 0) throw Bad
      val param = r.u(pBits).toInt
      if (param == escape) {
        val raw = r.u(5).toInt
        var i = 0
        while (i < count) { x(idx) = if (raw == 0) 0L else r.s(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary().toLong
          val u = (q << param) | r.u(param)
          x(idx) = (u >>> 1) ^ -(u & 1L) // zig-zag unfold
          idx += 1
          i += 1
        }
      }
      j += 1
    }
  }

  // ----------------------------------------------------------- features

  /** Audio features in the [[Wav.Features]] shape (`audioFormat` =
    * [[FormatTag]]); peak/rms over all channels' interleaved samples. */
  def features(bytes: Array[Byte]): Option[Wav.Features] =
    decode(bytes).map { d =>
      var peak = 0
      var sumSq = 0.0
      var i = 0
      while (i < d.samples.length) {
        val v = d.samples(i)
        val a = math.abs(v)
        if (a > peak) peak = a
        sumSq += v.toDouble * v.toDouble
        i += 1
      }
      val rms = if (d.samples.length == 0) 0.0 else math.sqrt(sumSq / d.samples.length)
      Wav.Features(d.channels, d.sampleRate, d.bps, d.nFrames, peak, rms, FormatTag)
    }

  /** Interleaved decoded samples (spec/debug surface, like [[Wav.samples]]). */
  def samples(bytes: Array[Byte]): Option[Array[Int]] = decode(bytes).map(_.samples)

  // ------------------------------------------------------------- encode

  /** One stored (pre-decorrelation) channel of a frame. For side-coded
    * assignments the caller provides the STORED channels (left/side,
    * side/right, or mid/side), exactly as they travel in the stream. */
  sealed trait Subframe { def blockSize: Int }
  /** All-equal channel → 1 sample on the wire. */
  final case class SubConstant(value: Long, blockSize: Int) extends Subframe
  /** Uncoded samples (the no-prediction fallback). */
  final case class SubVerbatim(samples: Array[Long]) extends Subframe {
    def blockSize: Int = samples.length
  }
  /** Fixed predictor of the given order over the FULL signal. */
  final case class SubFixed(order: Int, samples: Array[Long],
      partitionOrder: Int = 0) extends Subframe {
    require(order >= 0 && order <= 4, s"fixed order $order")
    def blockSize: Int = samples.length
  }
  /** Quantized LPC: x[n] = res[n] + (Σ coef(i)·x[n-1-i]) >> shift. */
  final case class SubLpc(coefs: Array[Int], shift: Int, precision: Int,
      samples: Array[Long], partitionOrder: Int = 0) extends Subframe {
    require(coefs.nonEmpty && coefs.length <= 32, "LPC order 1..32")
    require(precision >= 1 && precision <= 15, s"precision $precision")
    require(shift >= 0 && shift <= 31, s"shift $shift")
    require(coefs.forall(c => c >= -(1 << (precision - 1)) && c < (1 << (precision - 1))),
      "coefficients must fit the declared precision")
    def blockSize: Int = samples.length
  }

  /** One frame: channel assignment (0-7 independent, 8 left/side,
    * 9 right/side, 10 mid/side) + the stored channels. */
  final case class Frame(assign: Int, subs: Seq[Subframe]) {
    require(assign >= 0 && assign <= 10, s"assign $assign")
    require(
      if (assign <= 7) subs.length == assign + 1 else subs.length == 2,
      "channel count must match the assignment")
    require(subs.map(_.blockSize).distinct.size == 1, "channels share one block size")
    def blockSize: Int = subs.head.blockSize
  }

  private val BlockSizeCodes = Map(
    192 -> 1, 576 -> 2, 1152 -> 3, 2304 -> 4, 4608 -> 5,
    256 -> 8, 512 -> 9, 1024 -> 10, 2048 -> 11, 4096 -> 12,
    8192 -> 13, 16384 -> 14, 32768 -> 15)
  private val SampleRateCodes = Map(
    88200 -> 1, 176400 -> 2, 192000 -> 3, 8000 -> 4, 16000 -> 5, 22050 -> 6,
    24000 -> 7, 32000 -> 8, 44100 -> 9, 48000 -> 10, 96000 -> 11)
  private val SampleSizeCodes = Map(8 -> 1, 12 -> 2, 16 -> 4, 20 -> 5, 24 -> 6, 32 -> 7)

  /** Spec-conformant fixed-blocking stream from explicit frame plans.
    * Every frame must share the first frame's block size except the last
    * (the fixed-blocking tail rule). */
  def encodeFlac(frames: Seq[Frame], sampleRate: Int, bps: Int): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    require(SampleSizeCodes.contains(bps), s"unsupported bps $bps")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"sample rate $sampleRate")
    val head = frames.head.blockSize
    require(frames.init.forall(_.blockSize == head), "only the last frame may differ")
    require(frames.last.blockSize <= head, "tail frame cannot exceed the block size")
    // the 16-bit header code caps encodable block sizes; without this a
    // 70000-sample frame would write a silently-truncated header
    require(head >= 1 && head <= 65536, s"block size $head outside 1..65536")
    val channels = if (frames.head.assign <= 7) frames.head.assign + 1 else 2
    require(frames.forall(f => (if (f.assign <= 7) f.assign + 1 else 2) == channels),
      "channel count is fixed for the stream")
    val total = frames.map(_.blockSize.toLong).sum

    val w = new BitWriter
    "fLaC".foreach(c => w.u(8, c.toLong))
    w.u(1, 1); w.u(7, 0); w.u(24, 34) // last-block STREAMINFO
    val minB = frames.map(_.blockSize).min
    w.u(16, minB.toLong); w.u(16, head.toLong)
    w.u(24, 0); w.u(24, 0) // frame sizes unknown
    w.u(20, sampleRate.toLong); w.u(3, (channels - 1).toLong); w.u(5, (bps - 1).toLong)
    w.u(36, total)
    (0 until 4).foreach(_ => w.u(32, 0)) // md5 unknown

    frames.zipWithIndex.foreach { case (f, fi) =>
      val frameStart = w.snapshot().length
      w.u(14, 0x3ffe); w.u(1, 0); w.u(1, 0) // sync, reserved, fixed blocking
      val bs = f.blockSize
      val bsCode = BlockSizeCodes.getOrElse(bs, if (bs <= 256) 6 else 7)
      val srCode = SampleRateCodes.getOrElse(sampleRate, if (sampleRate <= 65535) 13 else 0)
      w.u(4, bsCode.toLong)
      w.u(4, srCode.toLong)
      w.u(4, f.assign.toLong)
      w.u(3, SampleSizeCodes(bps).toLong)
      w.u(1, 0)
      writeCodedNumber(w, fi.toLong)
      if (bsCode == 6) w.u(8, (bs - 1).toLong)
      if (bsCode == 7) w.u(16, (bs - 1).toLong)
      if (srCode == 13) w.u(16, sampleRate.toLong)
      val headerBytes = w.snapshot()
      w.u(8, crc8(headerBytes, frameStart, headerBytes.length).toLong)

      f.subs.zipWithIndex.foreach { case (sub, c) =>
        val extra = f.assign match {
          case 8  => if (c == 1) 1 else 0
          case 9  => if (c == 0) 1 else 0
          case 10 => if (c == 1) 1 else 0
          case _  => 0
        }
        writeSubframe(w, sub, bps + extra)
      }
      w.align()
      val frameBytes = w.snapshot()
      w.u(16, crc16(frameBytes, frameStart, frameBytes.length).toLong)
    }
    w.result()
  }

  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    require(v >= 0, "coded numbers are unsigned")
    if (v < 0x80) w.u(8, v)
    else {
      var n = 2 // total bytes; an n-byte sequence carries 5n+1 payload bits
      while (n < 7 && v >= (1L << (5 * n + 1))) n += 1
      w.u(n, (1L << n) - 1); w.u(1, 0); w.u(7 - n, v >>> (6 * (n - 1)))
      var i = n - 2
      while (i >= 0) { w.u(2, 2); w.u(6, v >>> (6 * i)); i -= 1 }
    }
  }

  private def writeSubframe(w: BitWriter, sub: Subframe, bps: Int): Unit = {
    val lim = 1L << (bps - 1)
    def checked(v: Long): Long = {
      require(v >= -lim && v < lim, s"sample $v exceeds $bps bits")
      v
    }
    w.u(1, 0)
    sub match {
      case SubConstant(v, _) =>
        w.u(6, 0); w.u(1, 0)
        w.u(bps, checked(v))
      case SubVerbatim(xs) =>
        w.u(6, 1); w.u(1, 0)
        xs.foreach(v => w.u(bps, checked(v)))
      case SubFixed(order, xs, po) =>
        require(order <= xs.length, "order exceeds block size")
        w.u(6, (8 + order).toLong); w.u(1, 0)
        (0 until order).foreach(i => w.u(bps, checked(xs(i))))
        writeResiduals(w, residualsOf(xs, FixedCoefs(order), 0), order, po)
      case SubLpc(coefs, shift, precision, xs, po) =>
        require(coefs.length <= xs.length, "order exceeds block size")
        w.u(6, (31 + coefs.length).toLong); w.u(1, 0)
        (0 until coefs.length).foreach(i => w.u(bps, checked(xs(i))))
        w.u(4, (precision - 1).toLong)
        w.u(5, shift.toLong)
        coefs.foreach(c => w.u(precision, c.toLong))
        writeResiduals(w, residualsOf(xs, coefs, shift), coefs.length, po)
    }
  }

  private def residualsOf(xs: Array[Long], coefs: Array[Int], shift: Int): Array[Long] = {
    val order = coefs.length
    Array.tabulate(xs.length) { n =>
      if (n < order) 0L
      else {
        var sum = 0L
        var i = 0
        while (i < order) { sum += coefs(i).toLong * xs(n - 1 - i); i += 1 }
        xs(n) - (sum >> shift)
      }
    }
  }

  /** Cost-optimal per-partition coding: best Rice parameter vs the
    * raw-bits escape; method 0 (4-bit params) when every partition fits,
    * else method 1. */
  private def writeResiduals(w: BitWriter, res: Array[Long], order: Int,
      po: Int): Unit = {
    val blockSize = res.length
    val parts = 1 << po
    require(blockSize % parts == 0, s"partition order $po does not divide $blockSize")
    require((blockSize >> po) >= order, "first partition cannot be negative")
    def zig(v: Long): Long = (v << 1) ^ (v >> 63)
    // choose per-partition (riceParam | -1 for escape, escRawBits)
    val plans = (0 until parts).map { j =>
      val from = j * (blockSize >> po) + (if (j == 0) order else 0)
      val until = (j + 1) * (blockSize >> po)
      var bestP = 0
      var bestCost = Long.MaxValue
      var p = 0
      while (p <= 30) {
        var cost = 0L
        var i = from
        while (i < until && cost < bestCost) {
          cost += (zig(res(i)) >>> p) + 1 + p
          i += 1
        }
        if (cost < bestCost) { bestCost = cost; bestP = p }
        p += 1
      }
      // the escape's bit-count field is 5 bits, so raw caps at 31; a
      // residual needing more cannot use the escape (Rice always can)
      var raw = 1
      var fits = true
      var i = from
      while (i < until) {
        val v = res(i)
        while (raw < 31 && (v >= (1L << (raw - 1)) || v < -(1L << (raw - 1)))) raw += 1
        if (v >= (1L << (raw - 1)) || v < -(1L << (raw - 1))) fits = false
        i += 1
      }
      val escCost = if (fits) 5L + (until - from).toLong * raw else Long.MaxValue
      if (escCost < bestCost) (-1, raw, from, until) else (bestP, 0, from, until)
    }
    val method = if (plans.forall(p => p._1 <= 14)) 0 else 1
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    w.u(2, method.toLong)
    w.u(4, po.toLong)
    plans.foreach { case (param, raw, from, until) =>
      if (param < 0) {
        w.u(pBits, escape.toLong); w.u(5, raw.toLong)
        (from until until).foreach(i => w.u(raw, res(i)))
      } else {
        w.u(pBits, param.toLong)
        (from until until).foreach { i =>
          val u = zig(res(i))
          val q = (u >>> param).toInt
          w.u(q, 0); w.u(1, 1) // unary quotient
          w.u(param, u)
        }
      }
    }
  }
}
