package graft.functions

/** Ogg container (Vorbis/Opus audio) METADATA — codec, channels, sample
  * rate, Opus pre-skip, duration, page count — by walking the public
  * RFC 3533 page grammar ("OggS" capture, header-type flags, 64-bit
  * granule position, lacing tables) with REAL per-page CRC verification
  * (the Ogg CRC-32: poly 0x04c11db7, no reflection, zero init/xor,
  * computed with the CRC field zeroed), plus the published
  * identification headers: Vorbis I §4.2.2 (`\x01vorbis`) and RFC 7845
  * §5.1 (`OpusHead`). Duration comes from the stream's final granule
  * position — Vorbis granules are PCM samples at the declared rate;
  * Opus granules are 48 kHz samples less the pre-skip. This is the
  * ffprobe-shaped operation for the web's streaming-audio container;
  * sample DECODE (MDCT/CELT/SILK) genuinely needs codec libraries this
  * container doesn't ship and stays with the clearly-marked stubs.
  *
  *  - a truncated FINAL page is tolerated (a partial download still
  *    reports the duration seen); desynced capture or a failed CRC
  *    classifies — that is not a clean Ogg stream
  *  - multiplexed streams: the FIRST audio BOS wins; other serials'
  *    granules are ignored
  *
  * Malformed payloads classify (None), never throw. */
object Ogg {

  final case class Meta(
      codec: String, // "vorbis" | "opus"
      channels: Int,
      sampleRate: Int, // Vorbis: declared rate; Opus: 48000 (decode rate)
      preSkipSamples: Int, // Opus pre-skip; 0 for Vorbis
      durationMs: Long,
      pages: Int)

  def isOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'

  // Ogg CRC-32: forward polynomial, no reflection, init 0, no final xor
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }

  /** CRC over a page image with its CRC field (bytes 22-25) zeroed. */
  private def pageCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = 0
    while (i < len) {
      val v = if (i >= 22 && i < 26) 0 else b(off + i) & 0xff
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ v) & 0xff)
      i += 1
    }
    c
  }

  private def u32le(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def s64le(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  /** Container metadata, or None when the payload is not a clean Ogg
    * audio stream. */
  def audioMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isOgg(bytes)) return None
      var p = 0
      var pages = 0
      var codec: String = null
      var serial = -1L
      var channels = 0; var rate = 0; var preSkip = 0
      var lastGranule = -1L
      var clean = true
      while (clean && p + 27 <= bytes.length) {
        if (!(bytes(p) == 'O' && bytes(p + 1) == 'g' && bytes(p + 2) == 'g' &&
            bytes(p + 3) == 'S' && bytes(p + 4) == 0)) {
          return None // capture desync mid-stream: not a clean Ogg
        }
        val headerType = bytes(p + 5) & 0xff
        val granule = s64le(bytes, p + 6)
        val ser = u32le(bytes, p + 14)
        val nSegs = bytes(p + 26) & 0xff
        if (p + 27 + nSegs > bytes.length) clean = false // truncated final page
        else {
          var payLen = 0
          var i = 0
          while (i < nSegs) { payLen += bytes(p + 27 + i) & 0xff; i += 1 }
          val pageLen = 27 + nSegs + payLen
          if (p + pageLen > bytes.length) clean = false // truncated final page
          else {
            val declared = u32le(bytes, p + 22).toInt
            if (pageCrc(bytes, p, pageLen) != declared) return None
            pages += 1
            val pay = p + 27 + nSegs
            if ((headerType & 2) != 0 && codec == null && payLen >= 8) {
              // BOS: the first packet is the identification header
              if (bytes(pay) == 1 && bytes(pay + 1) == 'v' && bytes(pay + 2) == 'o' &&
                  bytes(pay + 3) == 'r' && bytes(pay + 4) == 'b' &&
                  bytes(pay + 5) == 'i' && bytes(pay + 6) == 's' && payLen >= 16) {
                // \x01vorbis ver(4) channels(1) rate(4, LE)
                codec = "vorbis"
                serial = ser
                channels = bytes(pay + 11) & 0xff
                rate = u32le(bytes, pay + 12).toInt
              } else if (bytes(pay) == 'O' && bytes(pay + 1) == 'p' &&
                  bytes(pay + 2) == 'u' && bytes(pay + 3) == 's' &&
                  bytes(pay + 4) == 'H' && bytes(pay + 5) == 'e' &&
                  bytes(pay + 6) == 'a' && bytes(pay + 7) == 'd' && payLen >= 19) {
                // OpusHead ver(1) channels(1) preskip(2 LE) inputrate(4 LE)
                codec = "opus"
                serial = ser
                channels = bytes(pay + 9) & 0xff
                preSkip = ((bytes(pay + 10) & 0xff) | ((bytes(pay + 11) & 0xff) << 8))
                rate = 48000 // Opus always decodes at 48 kHz
              }
            }
            if (ser == serial && granule >= 0 && granule > lastGranule)
              lastGranule = granule
            p += pageLen
          }
        }
      }
      if (codec == null || pages < 2 || rate <= 0 || channels <= 0) return None
      val samples = codec match {
        case "opus" => math.max(0L, lastGranule - preSkip)
        case _ => math.max(0L, lastGranule)
      }
      Some(Meta(codec, channels, rate, preSkip, samples * 1000L / rate, pages))
    } catch { case scala.util.control.NonFatal(_) => None }

  // =====================================================================
  // Fixture-side encoder: real Ogg pages (correct lacing + CRC) carrying
  // real identification headers and zeroed audio packets — valid streams
  // with no decodable sound; the metadata walk never parses audio.

  /** One page; packets are concatenated with 255-lacing continuation
    * per RFC 3533 §6 (a multiple-of-255 packet gets a closing 0). */
  def encodePage(headerType: Int, granule: Long, serial: Long, seq: Long,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = packets.flatMap { pk =>
      val full = Array.fill(pk.length / 255)(255)
      if (pk.length % 255 == 0 && pk.length > 0) full :+ 0
      else if (pk.isEmpty) Seq(0)
      else full :+ (pk.length % 255)
    }
    require(lacing.length <= 255, "page overflow: split packets across pages")
    val o = new java.io.ByteArrayOutputStream()
    o.write('O'); o.write('g'); o.write('g'); o.write('S'); o.write(0)
    o.write(headerType)
    (0 until 8).foreach(i => o.write(((granule >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => o.write(((serial >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => o.write(((seq >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(_ => o.write(0)) // CRC placeholder
    o.write(lacing.length)
    lacing.foreach(o.write)
    packets.foreach(pk => o.write(pk))
    val page = o.toByteArray
    val c = pageCrc(page, 0, page.length)
    page(22) = (c & 0xff).toByte
    page(23) = ((c >> 8) & 0xff).toByte
    page(24) = ((c >> 16) & 0xff).toByte
    page(25) = ((c >> 24) & 0xff).toByte
    page
  }

  private def vorbisIdent(channels: Int, rate: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(1); "vorbis".foreach(ch => o.write(ch.toInt))
    (0 until 4).foreach(_ => o.write(0)) // version 0
    o.write(channels)
    (0 until 4).foreach(i => o.write((rate >> (8 * i)) & 0xff))
    (0 until 12).foreach(_ => o.write(0)) // bitrates
    o.write(0xb8) // blocksizes 256/2048
    o.write(1) // framing bit
    o.toByteArray
  }

  private def opusHead(channels: Int, preSkip: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    "OpusHead".foreach(ch => o.write(ch.toInt))
    o.write(1) // version
    o.write(channels)
    o.write(preSkip & 0xff); o.write((preSkip >> 8) & 0xff)
    (0 until 4).foreach(i => o.write((48000 >> (8 * i)) & 0xff)) // input rate
    o.write(0); o.write(0) // output gain
    o.write(0) // mapping family 0
    o.toByteArray
  }

  /** A complete stream: BOS ident page, a header page (comment [+setup]),
    * then `audioPages` pages whose granules step evenly to `granuleEnd`
    * (EOS on the last). `bigSetup` makes the setup packet span lacing
    * values (>255 bytes) to exercise continuation lacing. */
  def encodeStream(codec: String, channels: Int, rate: Int, preSkip: Int,
      granuleEnd: Long, audioPages: Int, serial: Long = 0x6f676721L,
      bigSetup: Boolean = false): Array[Byte] = {
    require(audioPages >= 1)
    val o = new java.io.ByteArrayOutputStream()
    val ident = codec match {
      case "vorbis" => vorbisIdent(channels, rate)
      case "opus" => opusHead(channels, preSkip)
      case other => throw new IllegalArgumentException(other)
    }
    o.write(encodePage(2, 0, serial, 0, Seq(ident)))
    val headers: Seq[Array[Byte]] = codec match {
      case "vorbis" =>
        val comment = (Array[Byte](3) ++ "vorbis".getBytes("US-ASCII")) ++ Array.fill(8)(0.toByte)
        val setup = (Array[Byte](5) ++ "vorbis".getBytes("US-ASCII")) ++
          Array.fill(if (bigSetup) 600 else 40)(0x5a.toByte)
        Seq(comment, setup)
      case _ =>
        Seq("OpusTags".getBytes("US-ASCII") ++ Array.fill(8)(0.toByte))
    }
    o.write(encodePage(0, 0, serial, 1, headers))
    (1 to audioPages).foreach { k =>
      val granule = granuleEnd * k / audioPages
      val eos = if (k == audioPages) 4 else 0
      o.write(encodePage(eos, granule, serial, 1L + k,
        Seq(Array.fill(20 + k % 7)(0.toByte))))
    }
    o.toByteArray
  }
}
