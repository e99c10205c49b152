package graft.functions

/** Real audio decode for AIFF (Apple/EA IFF-85 "Audio Interchange File
  * Format", 1988 public spec) — the BIG-endian counterpart of [[Wav]]:
  * a FORM/chunk walk, signed big-endian PCM (8-bit AIFF PCM is SIGNED,
  * unlike WAV's unsigned-centered 8-bit), and the format's one genuinely
  * tricky field — the COMM chunk's sample rate stored as an 80-bit IEEE
  * 754 EXTENDED-precision float (1 sign + 15 exponent bits, bias 16383,
  * 64-bit mantissa with an EXPLICIT integer bit). No codec library
  * needed; slots into [[AudioContainers]] beside [[Wav]]/[[Flac]].
  *
  * Layout:
  * {{{
  *   "FORM" <u32be size> "AIFF"
  *   ( <4cc> <u32be size> body [pad byte if size odd] )*
  *   "COMM": i16 numChannels, u32 numSampleFrames, i16 sampleSize(bits),
  *           extended80 sampleRate
  *   "SSND": u32 offset, u32 blockSize, then offset bytes of fill, then
  *           interleaved big-endian SIGNED PCM frames
  * }}}
  * The walk matters: real AIFFs carry NAME/ANNO/MARK chunks in any order.
  * AIFC (compressed variants) is a different FORM type and classifies as
  * undecodable here. Contract matches [[Wav]]: malformed/truncated/null
  * payloads yield None, never a throw.
  */
object Aiff {

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  def isAiff(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourcc(bytes, 0, "FORM") && fourcc(bytes, 8, "AIFF")

  /** Decode the COMM chunk's 80-bit extended-precision sample rate. The
    * mantissa's integer bit is EXPLICIT (no hidden bit), so the value is
    * `mantissa · 2^(exp − 16383 − 63)`; the mantissa is an UNSIGNED 64-bit
    * quantity (top bit set for any normalized value — naive signed Long
    * math would negate every real-world rate). */
  private[graft] def extended80(b: Array[Byte], i: Int): Double = {
    val se = u16(b, i)
    val exp = se & 0x7fff
    var mant = 0L
    var j = 0
    while (j < 8) { mant = (mant << 8) | (b(i + 2 + j) & 0xffL); j += 1 }
    if (exp == 0 && mant == 0L) return 0.0
    // unsigned Long → Double without sign corruption
    val m = if (mant >= 0) mant.toDouble
            else (mant >>> 1).toDouble * 2.0 + (mant & 1L)
    val v = m * math.pow(2.0, exp - 16383 - 63)
    if ((se & 0x8000) != 0) -v else v
  }

  /** Encode a positive integer rate as 80-bit extended (the inverse
    * surface): exponent = 16383 + floor(log2 rate), mantissa = rate
    * left-justified to bit 63. */
  private[graft] def extended80Of(rate: Int): Array[Byte] = {
    require(rate > 0, s"sample rate must be positive, got $rate")
    val h = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val exp = 16383 + h
    val mant = rate.toLong << (63 - h)
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0xff).toByte; out(1) = (exp & 0xff).toByte
    var j = 0
    while (j < 8) { out(2 + j) = ((mant >>> (56 - 8 * j)) & 0xff).toByte; j += 1 }
    out
  }

  private final case class Facts(channels: Int, declaredFrames: Long, bits: Int,
      sampleRate: Int, dataOff: Int, dataLen: Int)

  private def parseFacts(bytes: Array[Byte]): Option[Facts] = {
    if (!isAiff(bytes)) return None
    var channels = -1; var declared = -1L; var bits = -1; var rate = -1
    var dataOff = -1; var dataLen = -1
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4)
      val body = pos + 8
      val avail = math.min(size, (bytes.length - body).toLong).toInt
      if (fourcc(bytes, pos, "COMM") && avail >= 18) {
        channels = u16(bytes, body)
        declared = u32(bytes, body + 2)
        bits = u16(bytes, body + 6)
        val r = extended80(bytes, body + 8)
        rate = if (r.isNaN || r < 1.0 || r > 1e7) -1 else math.round(r).toInt
      } else if (fourcc(bytes, pos, "SSND") && avail >= 8 && dataOff < 0) {
        // body leads with offset/blockSize; sound data starts offset bytes in
        val off = u32(bytes, body)
        if (off <= (avail - 8).toLong) {
          dataOff = body + 8 + off.toInt
          dataLen = avail - 8 - off.toInt
        }
      }
      val next = body.toLong + size + (size & 1L) // chunks pad to even
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    if (channels <= 0 || rate <= 0 || dataOff < 0) return None
    if (bits != 8 && bits != 16) return None
    Some(Facts(channels, declared, bits, rate, dataOff, dataLen))
  }

  private def foreachSample(bytes: Array[Byte], f: Facts)(g: Int => Unit): Int = {
    val bpf = (f.bits / 8) * f.channels
    // COMM's declared frame count bounds the data; a truncated payload
    // decodes the frames actually present
    val present = f.dataLen / bpf
    val nFrames =
      if (f.declaredFrames >= 0L && f.declaredFrames <= present.toLong)
        f.declaredFrames.toInt
      else present
    var i = 0
    val nSamples = nFrames * f.channels
    while (i < nSamples) {
      val v = if (f.bits == 8) bytes(f.dataOff + i).toInt // SIGNED 8-bit
      else { // 16-bit signed big-endian
        val raw = u16(bytes, f.dataOff + 2 * i)
        if (raw >= 0x8000) raw - 0x10000 else raw
      }
      g(v)
      i += 1
    }
    nFrames
  }

  def features(bytes: Array[Byte]): Option[Wav.Features] =
    parseFacts(bytes).map { f =>
      var peak = 0; var sumSq = 0.0; var n = 0L
      val nFrames = foreachSample(bytes, f) { v =>
        val a = math.abs(v); if (a > peak) peak = a
        sumSq += v.toDouble * v; n += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      Wav.Features(f.channels, f.sampleRate, f.bits, nFrames, peak, rms)
    }

  def samples(bytes: Array[Byte]): Option[Array[Int]] =
    parseFacts(bytes).map { f =>
      val out = Array.newBuilder[Int]
      foreachSample(bytes, f)(out += _)
      out.result()
    }

  /** 16-bit big-endian PCM mono encode (the inverse surface): FORM +
    * COMM (with the real 80-bit rate) + SSND. */
  def encodePcm16Mono(samplesIn: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samplesIn.length * 2
    val bos = new java.io.ByteArrayOutputStream(54 + dataLen)
    def ascii(s: String): Unit = s.foreach(c => bos.write(c.toInt))
    def u32be(v: Long): Unit = { bos.write(((v >> 24) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write((v & 0xff).toInt) }
    def u16be(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    // FORM size = "AIFF"(4) + COMM chunk(8+18) + SSND chunk(8+8+data)
    ascii("FORM"); u32be(4L + 26 + 16 + dataLen); ascii("AIFF")
    ascii("COMM"); u32be(18L)
    u16be(1); u32be(samplesIn.length.toLong); u16be(16)
    extended80Of(sampleRate).foreach(b => bos.write(b & 0xff))
    ascii("SSND"); u32be(8L + dataLen)
    u32be(0L); u32be(0L) // offset, blockSize
    samplesIn.foreach(s => u16be(s & 0xffff))
    bos.toByteArray
  }
}
