package graft.functions

/** Real audio decode for the Sun/NeXT AU (".snd") format — the oldest
  * big-endian audio container still in the wild (Sun 1992 public spec;
  * the native format of μ-law telephony dumps). The header is six
  * big-endian u32 fields; the data offset is VARIABLE (an annotation
  * region sits between header and data — fixed-24-byte parsing misreads
  * any file that uses it) and the data size may be 0xFFFFFFFF meaning
  * "until EOF". Encodings decoded for real: 1 = G.711 μ-law (via
  * [[Wav.ulaw2linear]]), 27 = G.711 A-law, 2 = 8-bit SIGNED linear PCM
  * (unlike WAV's unsigned 8-bit), 3 = 16-bit big-endian PCM. Anything
  * else (ADPCM variants, floats) classifies as undecodable here.
  *
  * Contract matches [[Wav]]/[[Aiff]]: malformed, truncated or null
  * payloads yield None — never a throw.
  */
object Au {

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  def isAu(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 24 &&
      bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' && bytes(3) == 'd'

  private final case class Facts(encoding: Int, channels: Int, sampleRate: Int,
      dataOff: Int, dataLen: Int)

  private def parseFacts(bytes: Array[Byte]): Option[Facts] = {
    if (!isAu(bytes)) return None
    val dataOff = u32(bytes, 4)
    val dataSize = u32(bytes, 8)
    val encoding = u32(bytes, 12).toInt
    val rate = u32(bytes, 16)
    val channels = u32(bytes, 20)
    if (dataOff < 24L || dataOff > bytes.length.toLong) return None
    if (rate <= 0L || rate > 1e7.toLong || channels <= 0L || channels > 64L) return None
    if (encoding != 1 && encoding != 2 && encoding != 3 && encoding != 27) return None
    val present = bytes.length.toLong - dataOff
    // 0xFFFFFFFF = unknown → until EOF; a declared size is still bounded
    // by what's actually present (truncation discipline)
    val len = if (dataSize == 0xffffffffL) present else math.min(dataSize, present)
    Some(Facts(encoding, channels.toInt, rate.toInt, dataOff.toInt, len.toInt))
  }

  private def foreachSample(bytes: Array[Byte], f: Facts)(g: Int => Unit): Int = {
    val bytesPerSample = if (f.encoding == 3) 2 else 1
    val nFrames = f.dataLen / (bytesPerSample * f.channels)
    val nSamples = nFrames * f.channels
    var i = 0
    while (i < nSamples) {
      val v = f.encoding match {
        case 1 => Wav.ulaw2linear(bytes(f.dataOff + i) & 0xff)
        case 27 => Wav.alaw2linear(bytes(f.dataOff + i) & 0xff)
        case 2 => bytes(f.dataOff + i).toInt // SIGNED 8-bit linear
        case _ => // 16-bit signed big-endian
          val raw = ((bytes(f.dataOff + 2 * i) & 0xff) << 8) |
            (bytes(f.dataOff + 2 * i + 1) & 0xff)
          if (raw >= 0x8000) raw - 0x10000 else raw
      }
      g(v)
      i += 1
    }
    nFrames
  }

  /** `audioFormat` reports the WAV-convention tag for the G.711 laws
    * (7 μ-law / 6 A-law, matching [[Wav]] so downstream gates share one
    * vocabulary) and 1 for linear PCM. */
  def features(bytes: Array[Byte]): Option[Wav.Features] =
    parseFacts(bytes).map { f =>
      var peak = 0; var sumSq = 0.0; var n = 0L
      val nFrames = foreachSample(bytes, f) { v =>
        val a = math.abs(v); if (a > peak) peak = a
        sumSq += v.toDouble * v; n += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      val bits = if (f.encoding == 3) 16 else 8
      val tag = f.encoding match {
        case 1 => 7; case 27 => 6; case _ => 1
      }
      Wav.Features(f.channels, f.sampleRate, bits, nFrames, peak, rms, tag)
    }

  def samples(bytes: Array[Byte]): Option[Array[Int]] =
    parseFacts(bytes).map { f =>
      val out = Array.newBuilder[Int]
      foreachSample(bytes, f)(out += _)
      out.result()
    }

  /** Mono encode of raw code/sample bytes under the given AU encoding
    * (the inverse surface), with `annotation` bytes between header and
    * data — the variable-offset layout real writers produce. */
  def encodeMono(data: Array[Byte], sampleRate: Int, encoding: Int,
      annotation: Int = 8): Array[Byte] = {
    require(encoding == 1 || encoding == 2 || encoding == 3 || encoding == 27,
      s"unsupported AU encoding $encoding")
    require(annotation >= 0, "annotation size must be nonnegative")
    val off = 24 + annotation
    val bos = new java.io.ByteArrayOutputStream(off + data.length)
    def u32be(v: Long): Unit = { bos.write(((v >> 24) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write((v & 0xff).toInt) }
    bos.write('.'); bos.write('s'); bos.write('n'); bos.write('d')
    u32be(off.toLong); u32be(data.length.toLong); u32be(encoding.toLong)
    u32be(sampleRate.toLong); u32be(1L)
    (0 until annotation).foreach(_ => bos.write(0))
    bos.write(data, 0, data.length)
    bos.toByteArray
  }
}
