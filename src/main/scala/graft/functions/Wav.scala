package graft.functions

/** Real audio decode for RIFF/WAVE: uncompressed PCM ("WAV") plus the
  * G.711 compressed codecs (μ-law format 7 / A-law format 6 — ITU-T
  * G.711 1988, the telephony standard). Like [[Y4m]] for video, none of
  * these needs a codec library — a RIFF chunk walk, little-endian PCM
  * samples, and for G.711 a 256-entry exact integer expansion — so audio
  * feature extraction (sample rate, frame count, duration, peak, RMS)
  * runs as real pure-JVM decode inside distributed operators. Only
  * perceptual codecs (mp3/aac/…) stay behind the clearly-marked stub.
  *
  * Layout (public spec, RIFF 1991 / WAVE):
  * {{{
  *   "RIFF" <u32 size> "WAVE"
  *   ( <4cc id> <u32 size> payload [pad byte if size odd] )*
  *   "fmt ": u16 audioFormat(1=PCM, 6=A-law, 7=μ-law) u16 channels
  *           u32 sampleRate u32 byteRate u16 blockAlign u16 bitsPerSample
  *   "data": interleaved frames (8-bit unsigned | 16-bit signed LE PCM,
  *           or 8-bit G.711 code bytes)
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

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  def features(bytes: Array[Byte]): Option[Features] = {
    if (bytes == null || bytes.length < 12) return None
    if (!fourcc(bytes, 0, "RIFF") || !fourcc(bytes, 8, "WAVE")) return None
    var fmtTag = -1
    var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4) // u32: already nonneg
      val body = pos + 8
      val avail = math.min(size, (bytes.length - body).toLong).toInt
      if (fourcc(bytes, pos, "fmt ")) {
        if (avail < 16) return None
        fmtTag = u16(bytes, body)
        // 1=PCM, 6=A-law, 7=μ-law decode for real; perceptual codecs
        // (mp3/aac inside WAV) → classify as undecodable, never throw
        if (fmtTag != 1 && fmtTag != 6 && fmtTag != 7) return None
        channels = u16(bytes, body + 2)
        sampleRate = u32(bytes, body + 4).toInt
        bits = u16(bytes, body + 14)
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
    if (fmtTag == 1 && bits != 8 && bits != 16) return None
    if (fmtTag != 1 && bits != 8) return None // G.711 is 8-bit code bytes
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    val nFrames = dataLen / frameBytes
    val nSamples = nFrames * channels
    var peak = 0
    var sumSq = 0.0
    var i = 0
    while (i < nSamples) {
      val v = decodeSample(bytes, dataOff, i, fmtTag, bits)
      val a = math.abs(v)
      if (a > peak) peak = a
      sumSq += v.toDouble * v.toDouble
      i += 1
    }
    val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
    Some(Features(channels, sampleRate, bits, nFrames, peak, rms, fmtTag))
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
    features(bytes).map { f =>
      // re-walk for the data chunk; bounded to the features' frame count
      val out = new Array[Int](f.nFrames * f.channels)
      var pos = 12; var dataOff = -1
      while (dataOff < 0 && pos + 8 <= bytes.length) {
        if (fourcc(bytes, pos, "data")) dataOff = pos + 8
        else {
          val size = u32(bytes, pos + 4)
          val next = pos + 8L + size + (size & 1L)
          pos = if (next > bytes.length) bytes.length else next.toInt
        }
      }
      var i = 0
      while (i < out.length) {
        out(i) = decodeSample(bytes, dataOff, i, f.audioFormat, f.bitsPerSample)
        i += 1
      }
      out
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
