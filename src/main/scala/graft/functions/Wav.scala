package graft.functions

/** Real audio decode for RIFF/WAVE: uncompressed PCM ("WAV") plus the
  * G.711 compressed codecs (μ-law format 7 / A-law format 6 — ITU-T
  * G.711 1988, the telephony standard) plus IMA/DVI ADPCM (format 0x11 —
  * the IMA 1992 "Recommended Practices" 4-bit adaptive codec, 4:1
  * compression) plus Microsoft ADPCM (format 0x02 — the Windows 3.1/95
  * native 4-bit codec: a 2-tap LPC predictor with a per-block coefficient
  * PAIR selected from a table the file itself carries, plus nibble-driven
  * delta adaptation — structurally different machinery from IMA's
  * step-table walk). Like [[Y4m]] for video, none of these needs a codec
  * library — a RIFF chunk walk, little-endian PCM samples, for G.711 a
  * 256-entry exact integer expansion, and for the ADPCMs small adaptive
  * integer recurrences — so audio feature extraction (sample rate, frame
  * count, duration, peak, RMS) runs as real pure-JVM decode inside
  * distributed operators. Only perceptual codecs (mp3/aac/…) stay behind
  * the clearly-marked stub.
  *
  * Layout (public spec, RIFF 1991 / WAVE):
  * {{{
  *   "RIFF" <u32 size> "WAVE"
  *   ( <4cc id> <u32 size> payload [pad byte if size odd] )*
  *   "fmt ": u16 audioFormat(1=PCM, 2=MS ADPCM, 6=A-law, 7=μ-law,
  *           0x11=IMA ADPCM)
  *           u16 channels u32 sampleRate u32 byteRate u16 blockAlign
  *           u16 bitsPerSample [u16 cbSize u16 samplesPerBlock
  *           [u16 numCoef (i16 coef1 i16 coef2)*]]   — the coef table is
  *           MS ADPCM only; the first 7 pairs are the published standard
  *   "data": interleaved frames (8-bit unsigned | 16-bit signed LE PCM,
  *           8-bit G.711 code bytes, IMA ADPCM blocks of blockAlign
  *           bytes: per-channel 4-byte header (i16 predictor, u8 stepIndex,
  *           u8 reserved) then 4-byte-per-channel interleaved nibble
  *           groups, LOW nibble first, or MS ADPCM blocks: per-channel
  *           u8 bpred, then per-channel i16 idelta / i16 sample1 /
  *           i16 sample2 (field-major, channel-interleaved within each
  *           field), then nibbles HIGH-first alternating channels)
  * }}}
  * The chunk WALK matters: real files carry LIST/INFO/fact chunks before
  * or after data — fixed offsets would misparse them.
  *
  * Contract matches [[ImageOps.decode]]/[[Y4m.parse]]: malformed, truncated
  * or null payloads yield None — never a throw. A corrupt audio row must
  * CLASSIFY as invalid, not abort the stage.
  */
object Wav {

  /** Parsed stream facts + extracted features. `peak` is max |sample|,
    * `rms` is sqrt(mean(sample²)) over ALL channels' samples, both in
    * linear PCM units (8-bit PCM samples are centered: value − 128; G.711
    * code bytes are expanded to their 16-bit linear values first).
    * `audioFormat` is the fmt-chunk tag (1 PCM, 6 A-law, 7 μ-law). */
  final case class Features(
      channels: Int, sampleRate: Int, bitsPerSample: Int, nFrames: Int,
      peak: Int, rms: Double, audioFormat: Int = 1) {
    def durationMs: Long = nFrames.toLong * 1000L / sampleRate
  }

  /** ITU-T G.711 μ-law expansion, exact integer form (the Sun/ffmpeg
    * `ulaw2linear` shape; spec-gated byte-for-byte against the JDK's own
    * `javax.sound.sampled` ULAW converter in WavSpec). Complement, split
    * sign/segment/mantissa, re-add the 0x84 bias inside the shift. */
  def ulaw2linear(b: Int): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion (`alaw2linear`; sign bit SET after the
    * 0x55 toggle means positive — the opposite of μ-law). */
  def alaw2linear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8 else { t += 0x108; if (seg > 1) t <<= (seg - 1) }
    if ((a & 0x80) != 0) t else -t
  }

  // 256-entry expansion tables: the per-sample hot path is one array read
  private val UlawTable: Array[Int] = Array.tabulate(256)(ulaw2linear)
  private val AlawTable: Array[Int] = Array.tabulate(256)(alaw2linear)

  /** IMA ADPCM step-index adaptation per nibble magnitude (IMA 1992 §6;
    * identical 8-entry table mirrored over the sign bit). */
  private val AdpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA ADPCM quantizer step sizes, indices 0..88 (IMA 1992 §6). */
  private val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878,
    2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** One IMA ADPCM decode step: expand `nibble` against (predictor, index)
    * state, returning the new packed state `(newPredictor << 8) | newIndex`.
    * Exact integer form of the IMA 1992 reference decoder: diff =
    * step>>3 (+step if b2) (+step>>1 if b1) (+step>>2 if b0), sign b3;
    * predictor clamps to i16, index clamps to 0..88. */
  def adpcmStep(predictor: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = AdpcmStepTable(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p = if ((nibble & 8) != 0) predictor - diff else predictor + diff
    val pc = if (p > 32767) 32767 else if (p < -32768) -32768 else p
    val i2 = index + AdpcmIndexTable(nibble & 0xf)
    val ic = if (i2 < 0) 0 else if (i2 > 88) 88 else i2
    (pc, ic)
  }

  /** MS ADPCM standard predictor coefficient pairs (Microsoft multimedia
    * standards 1992; ×256 fixed-point). Files carry their own table in the
    * fmt extension — these are the required first 7 entries. */
  val MsCoef1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  val MsCoef2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  /** MS ADPCM delta adaptation per nibble (×256 fixed-point; same spec). */
  private val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** One MS ADPCM decode step: 2-tap LPC prediction from the last two
    * samples with the block's (c1, c2) pair, plus the SIGNED nibble scaled
    * by the adaptive delta. Returns `(sample, newDelta)`; the delta update
    * uses the OLD delta and floors at 16 (the published recurrence:
    * `delta' = max(16, (adapt[nib]·delta) >> 8)`). Exact integer form —
    * `>> 8` is the spec's arithmetic shift, NOT a divide (they differ on
    * negative predictor sums). */
  def msAdpcmStep(s1: Int, s2: Int, c1: Int, c2: Int, delta: Int, nibble: Int): (Int, Int) = {
    val signed = if ((nibble & 8) != 0) nibble - 16 else nibble
    val pred = ((s1 * c1 + s2 * c2) >> 8) + signed * delta
    val pc = if (pred > 32767) 32767 else if (pred < -32768) -32768 else pred
    val d2 = (MsAdaptTable(nibble & 0xf) * delta) >> 8
    (pc, if (d2 < 16) 16 else d2)
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i16(b: Array[Byte], i: Int): Int = {
    val raw = u16(b, i)
    if (raw >= 0x8000) raw - 0x10000 else raw
  }
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  /** Parsed fmt+data chunk facts; one walk feeds both [[features]] and
    * [[samples]]. `samplesPerBlock` only means anything for the ADPCMs;
    * `msC1`/`msC2` are MS ADPCM's file-carried coefficient table. */
  private final case class Facts(
      fmtTag: Int, channels: Int, sampleRate: Int, bits: Int,
      blockAlign: Int, samplesPerBlock: Int, dataOff: Int, dataLen: Int,
      msC1: Array[Int] = null, msC2: Array[Int] = null)

  private def parseFacts(bytes: Array[Byte]): Option[Facts] = {
    if (bytes == null || bytes.length < 12) return None
    if (!fourcc(bytes, 0, "RIFF") || !fourcc(bytes, 8, "WAVE")) return None
    var fmtTag = -1
    var channels = -1; var sampleRate = -1; var bits = -1
    var blockAlign = -1; var spb = -1
    var msC1: Array[Int] = null; var msC2: Array[Int] = null
    var dataOff = -1; var dataLen = -1
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4) // u32: already nonneg
      val body = pos + 8
      val avail = math.min(size, (bytes.length - body).toLong).toInt
      if (fourcc(bytes, pos, "fmt ")) {
        if (avail < 16) return None
        fmtTag = u16(bytes, body)
        // 1=PCM, 2=MS ADPCM, 6=A-law, 7=μ-law, 0x11=IMA ADPCM decode for
        // real; perceptual codecs (mp3/aac inside WAV) → classify as
        // undecodable, never throw
        if (fmtTag != 1 && fmtTag != 2 && fmtTag != 6 && fmtTag != 7 &&
            fmtTag != 0x11)
          return None
        channels = u16(bytes, body + 2)
        sampleRate = u32(bytes, body + 4).toInt
        blockAlign = u16(bytes, body + 12)
        bits = u16(bytes, body + 14)
        // IMA ADPCM fmt extension: u16 cbSize, u16 samplesPerBlock
        if (fmtTag == 0x11 && avail >= 20 && u16(bytes, body + 16) >= 2)
          spb = u16(bytes, body + 18)
        // MS ADPCM fmt extension: u16 cbSize, u16 samplesPerBlock,
        // u16 numCoef, numCoef × (i16 coef1, i16 coef2) — the DECODER
        // must honor the file's table (encoders may extend past the 7
        // standard pairs; bpred indexes into THIS table)
        if (fmtTag == 2 && avail >= 22) {
          spb = u16(bytes, body + 18)
          val nCoef = u16(bytes, body + 20)
          if (nCoef >= 1 && avail >= 22 + 4 * nCoef) {
            msC1 = Array.tabulate(nCoef)(j => i16(bytes, body + 22 + 4 * j))
            msC2 = Array.tabulate(nCoef)(j => i16(bytes, body + 24 + 4 * j))
          }
        }
      } else if (fourcc(bytes, pos, "data") && dataOff < 0) { // first data wins
        dataOff = body
        dataLen = avail // truncated data: use what's actually present
      }
      // advance in LONG: a hostile size near u32-max would overflow an Int
      // pos negative and index out of bounds — clamp to end instead
      val next = body.toLong + size + (size & 1L) // chunks pad to even
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    if (channels <= 0 || sampleRate <= 0 || dataOff < 0) return None
    fmtTag match {
      case 1 => if (bits != 8 && bits != 16) return None
      case 2 =>
        if (bits != 4) return None
        // MS ADPCM defines nibble interleave for mono/stereo only; the
        // block must at least hold the 7-byte-per-channel header
        if (channels > 2 || blockAlign < 7 * channels) return None
        if (msC1 == null) { msC1 = MsCoef1; msC2 = MsCoef2 } // no/short ext
        // spb default: header's 2 samples + 2 nibbles/byte over channels
        val spbMax = (blockAlign - 7 * channels) * 2 / channels + 2
        if (spb <= 0 || spb > spbMax) spb = spbMax
      case 0x11 =>
        if (bits != 4) return None
        // a block must hold the per-channel headers plus data: ≥1 byte for
        // mono (no group alignment), ≥1 complete 4-byte group per channel
        // for multi-channel
        if (channels == 1 && blockAlign < 5) return None
        if (channels > 1 && blockAlign < 8 * channels) return None
        // writers that omit the extension: decode everything past the
        // headers (the IMA recommended-practice default)
        val spbMax =
          if (channels == 1) (blockAlign - 4) * 2 + 1
          else (blockAlign - 4 * channels) / (4 * channels) * 8 + 1
        if (spb <= 0 || spb > spbMax) spb = spbMax
      case _ => if (bits != 8) return None // G.711 is 8-bit code bytes
    }
    Some(Facts(fmtTag, channels, sampleRate, bits, blockAlign, spb, dataOff,
      dataLen, msC1, msC2))
  }

  /** Stream every decoded linear sample (interleaved channel order) through
    * `g`; returns the FRAME count. PCM/G.711 decode positionally; IMA ADPCM
    * walks blockAlign-sized blocks, reseeding per-channel (predictor, index)
    * state from each block header — sample 0 of a block IS the header
    * predictor (IMA 1992 layout). */
  private def foreachSample(bytes: Array[Byte], f: Facts)(g: Int => Unit): Int =
    if (f.fmtTag == 0x11) foreachAdpcmSample(bytes, f)(g)
    else if (f.fmtTag == 2) foreachMsAdpcmSample(bytes, f)(g)
    else {
      val frameBytes = (f.bits / 8) * f.channels
      val nFrames = f.dataLen / frameBytes
      val nSamples = nFrames * f.channels
      var i = 0
      while (i < nSamples) {
        g(decodeSample(bytes, f.dataOff, i, f.fmtTag, f.bits))
        i += 1
      }
      nFrames
    }

  private def foreachAdpcmSample(bytes: Array[Byte], f: Facts)(g: Int => Unit): Int = {
    val ch = f.channels
    val preds = new Array[Int](ch); val idxs = new Array[Int](ch)
    var frames = 0
    var blockOff = f.dataOff
    val dataEnd = f.dataOff + f.dataLen
    while (blockOff + 4 * ch <= dataEnd) {
      val avail = math.min(f.blockAlign, dataEnd - blockOff)
      var c = 0
      while (c < ch) { // per-channel 4-byte header: i16 predictor, u8 index
        val raw = u16(bytes, blockOff + 4 * c)
        preds(c) = if (raw >= 0x8000) raw - 0x10000 else raw
        val i0 = bytes(blockOff + 4 * c + 2) & 0xff
        idxs(c) = if (i0 > 88) 88 else i0
        g(preds(c)) // frame 0 of the block is the header predictor
        c += 1
      }
      frames += 1
      var frameInBlock = 1
      if (ch == 1) {
        // mono data bytes are consecutive nibble pairs with NO group
        // alignment (a 512-byte block carries 508 data bytes — not a
        // multiple of 4); a truncated final block decodes what's present
        var bi = blockOff + 4
        val bend = blockOff + avail
        while (bi < bend && frameInBlock < f.samplesPerBlock) {
          val b = bytes(bi) & 0xff
          var s = 0
          while (s < 2 && frameInBlock < f.samplesPerBlock) {
            val nib = if (s == 0) b & 0xf else (b >> 4) & 0xf // low first
            val (p2, i2) = adpcmStep(preds(0), idxs(0), nib)
            preds(0) = p2; idxs(0) = i2
            g(p2); frames += 1; frameInBlock += 1
            s += 1
          }
          bi += 1
        }
      } else {
        // multi-channel: 4-byte groups per channel, interleaved, 8
        // samples/group/channel; only complete groups are well-formed
        val groups = (avail - 4 * ch) / (4 * ch)
        var gi = 0
        while (gi < groups && frameInBlock < f.samplesPerBlock) {
          val groupBase = blockOff + 4 * ch + gi * 4 * ch
          var s = 0
          while (s < 8 && frameInBlock < f.samplesPerBlock) {
            var c2 = 0
            while (c2 < ch) {
              val b = bytes(groupBase + 4 * c2 + (s >> 1)) & 0xff
              val nib = if ((s & 1) == 0) b & 0xf else (b >> 4) & 0xf // low first
              val (p2, i2) = adpcmStep(preds(c2), idxs(c2), nib)
              preds(c2) = p2; idxs(c2) = i2
              g(p2)
              c2 += 1
            }
            frames += 1; frameInBlock += 1
            s += 1
          }
          gi += 1
        }
      }
      blockOff += f.blockAlign
    }
    frames
  }

  /** MS ADPCM block walk. Per-block header is FIELD-major (all channels'
    * bpred bytes, then all ideltas, then all sample1s, then all sample2s);
    * the OLDER header sample (`sample2`) is frame 0 and `sample1` frame 1
    * — the published layout that trips decoders that emit header order.
    * Data nibbles come HIGH-first per byte (the opposite of IMA) and
    * alternate channels per nibble, so a stereo byte is exactly one frame.
    * A truncated final block decodes the prefix that is present. */
  private def foreachMsAdpcmSample(bytes: Array[Byte], f: Facts)(g: Int => Unit): Int = {
    val ch = f.channels
    val c1 = new Array[Int](ch); val c2 = new Array[Int](ch)
    val delta = new Array[Int](ch)
    val s1 = new Array[Int](ch); val s2 = new Array[Int](ch)
    var frames = 0
    var blockOff = f.dataOff
    val dataEnd = f.dataOff + f.dataLen
    while (blockOff + 7 * ch <= dataEnd) {
      val avail = math.min(f.blockAlign, dataEnd - blockOff)
      var c = 0
      while (c < ch) {
        // hostile bpred past the file's coef table: clamp to the last
        // entry (decode SOMETHING deterministic rather than abort — the
        // classify-don't-throw contract)
        val bp = math.min(bytes(blockOff + c) & 0xff, f.msC1.length - 1)
        c1(c) = f.msC1(bp); c2(c) = f.msC2(bp)
        delta(c) = i16(bytes, blockOff + ch + 2 * c)
        s1(c) = i16(bytes, blockOff + 3 * ch + 2 * c)
        s2(c) = i16(bytes, blockOff + 5 * ch + 2 * c)
        c += 1
      }
      var frameInBlock = 0
      if (frameInBlock < f.samplesPerBlock) { // frame 0: the OLDER sample
        var c3 = 0; while (c3 < ch) { g(s2(c3)); c3 += 1 }
        frames += 1; frameInBlock += 1
      }
      if (frameInBlock < f.samplesPerBlock) {
        var c3 = 0; while (c3 < ch) { g(s1(c3)); c3 += 1 }
        frames += 1; frameInBlock += 1
      }
      var bi = blockOff + 7 * ch
      val bend = blockOff + avail
      var nibIdx = 0 // running nibble counter: channel = nibIdx % ch
      var pending = 0 // samples emitted since the last full frame (stereo)
      while (bi < bend && frameInBlock < f.samplesPerBlock) {
        val b = bytes(bi) & 0xff
        var s = 0
        while (s < 2 && frameInBlock < f.samplesPerBlock) {
          val nib = if (s == 0) (b >> 4) & 0xf else b & 0xf // HIGH first
          val cc = nibIdx % ch
          val (v, d2) = msAdpcmStep(s1(cc), s2(cc), c1(cc), c2(cc), delta(cc), nib)
          s2(cc) = s1(cc); s1(cc) = v; delta(cc) = d2
          g(v)
          nibIdx += 1; pending += 1
          if (pending == ch) { frames += 1; frameInBlock += 1; pending = 0 }
          s += 1
        }
        bi += 1
      }
      blockOff += f.blockAlign
    }
    frames
  }

  def features(bytes: Array[Byte]): Option[Features] =
    parseFacts(bytes).map { f =>
      var peak = 0
      var sumSq = 0.0
      var n = 0L
      val nFrames = foreachSample(bytes, f) { v =>
        val a = math.abs(v)
        if (a > peak) peak = a
        sumSq += v.toDouble * v.toDouble
        n += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      Features(f.channels, f.sampleRate, f.bits, nFrames, peak, rms, f.fmtTag)
    }

  /** One linear PCM sample: raw PCM passthrough (8-bit centered / 16-bit
    * LE) or G.711 table expansion. */
  private def decodeSample(bytes: Array[Byte], dataOff: Int, i: Int,
      fmtTag: Int, bits: Int): Int = fmtTag match {
    case 7 => UlawTable(bytes(dataOff + i) & 0xff)
    case 6 => AlawTable(bytes(dataOff + i) & 0xff)
    case _ =>
      if (bits == 8) (bytes(dataOff + i) & 0xff) - 128 // 8-bit PCM is unsigned
      else { // 16-bit signed little-endian
        val raw = u16(bytes, dataOff + 2 * i)
        if (raw >= 0x8000) raw - 0x10000 else raw
      }
  }

  /** Raw centered samples (spec/debug surface; interleaved channel order). */
  def samples(bytes: Array[Byte]): Option[Array[Int]] =
    parseFacts(bytes).map { f =>
      val out = Array.newBuilder[Int]
      foreachSample(bytes, f)(out += _)
      out.result()
    }

  /** 8-bit G.711 mono encode (the compressed-codec inverse surface): the
    * raw code bytes verbatim under a fmt chunk tagged 6 (A-law) or 7
    * (μ-law), blockAlign 1 — the on-disk shape telephony tooling writes. */
  def encodeG711Mono(codeBytes: Array[Byte], sampleRate: Int, fmtTag: Int): Array[Byte] = {
    require(fmtTag == 6 || fmtTag == 7, s"G.711 fmt tag must be 6 or 7, got $fmtTag")
    val dataLen = codeBytes.length
    val pad = dataLen & 1 // RIFF chunks pad to even
    val w = new Riff.Writer
    w.ascii("RIFF"); w.u32(36L + dataLen + pad); w.ascii("WAVE")
    w.ascii("fmt "); w.u32(16L)
    w.u16(fmtTag); w.u16(1); w.u32(sampleRate.toLong)
    w.u32(sampleRate.toLong); w.u16(1); w.u16(8)
    w.ascii("data"); w.u32(dataLen.toLong)
    w.bytes(codeBytes)
    if (pad == 1) w.pad()
    w.result()
  }

  /** One mono IMA ADPCM block to write: the decoder state seeded by the
    * block header plus the raw 4-bit codes (low nibble first on disk). */
  final case class AdpcmBlock(predictor: Int, index: Int, nibbles: Array[Int]) {
    require(predictor >= -32768 && predictor <= 32767, s"predictor $predictor")
    require(index >= 0 && index <= 88, s"step index $index")
    require(nibbles.length % 2 == 0, "nibble count must be even (2 per byte)")
    require(nibbles.forall(n => n >= 0 && n <= 15), "nibbles are 4-bit")
  }

  /** Mono IMA ADPCM encode (the compressed-codec inverse surface): fmt
    * tag 0x11 with the cbSize/samplesPerBlock extension, fixed blockAlign
    * across blocks (the on-disk contract — all blocks equal-size except a
    * possibly-truncated last one, which this writer doesn't emit). */
  def encodeAdpcmMono(blocks: Seq[AdpcmBlock], sampleRate: Int): Array[Byte] = {
    require(blocks.nonEmpty, "ADPCM stream needs at least one block")
    val nib = blocks.head.nibbles.length
    require(blocks.forall(_.nibbles.length == nib), "blocks must share one size")
    val blockAlign = 4 + nib / 2
    val spb = nib + 1 // header sample + one per nibble
    val dataLen = blocks.length * blockAlign
    val pad = dataLen & 1 // RIFF chunks pad to even
    val w = new Riff.Writer
    // RIFF size = file − 8: "WAVE"(4) + fmt chunk(8+20) + data header(8)
    // + payload — the 20-byte fmt body (cbSize+samplesPerBlock) makes
    // this 40, not the plain-PCM encoders' 36
    w.ascii("RIFF"); w.u32(40L + dataLen + pad); w.ascii("WAVE")
    w.ascii("fmt "); w.u32(20L) // 16 standard + cbSize + samplesPerBlock
    w.u16(0x11); w.u16(1); w.u32(sampleRate.toLong)
    // byteRate ≈ blocks per second × blockAlign (informational)
    w.u32(sampleRate.toLong * blockAlign / spb); w.u16(blockAlign); w.u16(4)
    w.u16(2); w.u16(spb) // cbSize, samplesPerBlock
    w.ascii("data"); w.u32(dataLen.toLong)
    blocks.foreach { b =>
      w.u16(b.predictor & 0xffff); w.u16(b.index) // index u8 + reserved u8
      var i = 0
      while (i < nib) { // low nibble first
        w.bytes(Array(((b.nibbles(i) & 0xf) | ((b.nibbles(i + 1) & 0xf) << 4)).toByte))
        i += 2
      }
    }
    if (pad == 1) w.pad()
    w.result()
  }

  /** One MS ADPCM channel header: coefficient-pair index into the file's
    * table, initial delta, and the two warm-up samples (`sample1` is the
    * newer — it decodes as frame 1; `sample2` as frame 0). */
  final case class MsChan(bpred: Int, idelta: Int, sample1: Int, sample2: Int) {
    require(bpred >= 0 && bpred <= 6, s"bpred must index the standard table, got $bpred")
    require(idelta >= -32768 && idelta <= 32767, s"idelta $idelta")
    require(sample1 >= -32768 && sample1 <= 32767, s"sample1 $sample1")
    require(sample2 >= -32768 && sample2 <= 32767, s"sample2 $sample2")
  }

  /** One MS ADPCM block: per-channel headers plus the raw 4-bit codes in
    * wire order (high nibble first per byte, channels alternating). */
  final case class MsBlock(chans: Seq[MsChan], nibbles: Array[Int]) {
    require(chans.nonEmpty && chans.length <= 2, "MS ADPCM is mono or stereo")
    require(nibbles.length % 2 == 0, "nibble count must be even (2 per byte)")
    require(nibbles.length % chans.length == 0, "whole frames only")
    require(nibbles.forall(n => n >= 0 && n <= 15), "nibbles are 4-bit")
  }

  /** MS ADPCM encode (the compressed-codec inverse surface): fmt tag 0x02
    * with the cbSize/samplesPerBlock/coefficient-table extension (the 7
    * standard pairs), fixed blockAlign across blocks. */
  def encodeMsAdpcm(blocks: Seq[MsBlock], sampleRate: Int): Array[Byte] = {
    require(blocks.nonEmpty, "MS ADPCM stream needs at least one block")
    val ch = blocks.head.chans.length
    val nib = blocks.head.nibbles.length
    require(blocks.forall(b => b.chans.length == ch && b.nibbles.length == nib),
      "blocks must share one geometry")
    val blockAlign = 7 * ch + nib / 2
    val spb = 2 + nib / ch // two header samples + one per nibble per channel
    val dataLen = blocks.length * blockAlign
    val pad = dataLen & 1 // RIFF chunks pad to even
    val w = new Riff.Writer
    // fmt body: 16 standard + cbSize(2) + spb(2) + numCoef(2) + 7×4 = 50
    w.ascii("RIFF"); w.u32(20L + 50L + dataLen + pad); w.ascii("WAVE")
    w.ascii("fmt "); w.u32(50L)
    w.u16(2); w.u16(ch); w.u32(sampleRate.toLong)
    w.u32(sampleRate.toLong * blockAlign / spb); w.u16(blockAlign); w.u16(4)
    w.u16(32); w.u16(spb); w.u16(7) // cbSize, samplesPerBlock, numCoef
    (0 until 7).foreach { j => w.u16(MsCoef1(j) & 0xffff); w.u16(MsCoef2(j) & 0xffff) }
    w.ascii("data"); w.u32(dataLen.toLong)
    blocks.foreach { b =>
      b.chans.foreach(c => w.bytes(Array(c.bpred.toByte)))
      b.chans.foreach(c => w.u16(c.idelta & 0xffff))
      b.chans.foreach(c => w.u16(c.sample1 & 0xffff))
      b.chans.foreach(c => w.u16(c.sample2 & 0xffff))
      var i = 0
      while (i < nib) { // HIGH nibble first on the wire
        w.bytes(Array((((b.nibbles(i) & 0xf) << 4) | (b.nibbles(i + 1) & 0xf)).toByte))
        i += 2
      }
    }
    if (pad == 1) w.pad()
    w.result()
  }

  /** 16-bit PCM mono encode (the inverse surface, like [[Y4m.encodeFrame]]):
    * header + fmt + data chunks, little-endian. */
  def encodePcm16Mono(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val w = new Riff.Writer
    w.ascii("RIFF"); w.u32(36L + dataLen); w.ascii("WAVE")
    w.ascii("fmt "); w.u32(16L)
    w.u16(1); w.u16(1); w.u32(sampleRate.toLong)
    w.u32(sampleRate.toLong * 2); w.u16(2); w.u16(16)
    w.ascii("data"); w.u32(dataLen.toLong)
    samples.foreach(s => w.u16(s & 0xffff))
    w.result()
  }
}
