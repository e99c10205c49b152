package graft.functions

/** MPEG audio (MP3) frame-header METADATA — duration, bitrate, sample
  * rate, channels, layer, CBR/VBR — extracted by walking the public
  * 32-bit frame-header grammar (ISO 11172-3 / 13818-3 layout: 11-bit
  * sync, version, layer, bitrate/samplerate indices, padding, channel
  * mode) without decoding a single sample. This is the ffprobe-shaped
  * operation a training-data pipeline runs at 100 TB: estimate hours of
  * audio, bucket by rate/channels, drop non-audio — none of which needs
  * the psychoacoustic decode. Sample DECODE (subband synthesis + IMDCT)
  * genuinely needs a codec and stays with the clearly-marked stubs; this
  * module is the honest metadata half.
  *
  *  - leading ID3v2 tags are skipped (syncsafe size, v2.4 footer flag
  *    honored), padding gaps after the tag are resync-scanned (bounded),
  *    and trailing ID3v1 (128-byte "TAG") plus up to a frame of trailing
  *    junk are tolerated
  *  - at least [[MinFrames]] consistent frames must chain sync-to-sync
  *    (a lone 0xFFE sync in random bytes classifies, not parses)
  *  - free-format (bitrate index 0) and reserved indices classify
  *
  * Malformed/truncated payloads classify (None), never throw. */
object Mpeg {

  /** A random 11-bit sync match chains to a second valid frame with
    * probability ~2^-20; two chained frames make false positives
    * negligible while accepting every real MP3 (all are longer). */
  private val MinFrames = 2

  final case class Meta(
      version: String, // "MPEG1" | "MPEG2" | "MPEG2.5"
      layer: Int, // 1 | 2 | 3
      sampleRate: Int,
      channels: Int, // 1 | 2
      frames: Int,
      bitrateKbps: Int, // average over frames, rounded down
      durationMs: Long,
      vbr: Boolean)

  // bitrate tables, kbps, indices 1..14 (0 = free format, 15 = bad)
  private val V1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val V1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val V1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val V2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val V2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  private final case class Frame(
      version: Int, // 0 = 2.5, 2 = 2, 3 = 1 (header field values)
      layer: Int, // 1..3
      sampleRate: Int, bitrateKbps: Int, channels: Int,
      samples: Int, sizeBytes: Int)

  /** Parse one frame header at `p`; None when not a valid frame. */
  private def frameAt(b: Array[Byte], p: Int): Option[Frame] = {
    if (p + 4 > b.length) return None
    val h = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None // 11-bit sync
    val version = (h >>> 19) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layerBits = (h >>> 17) & 3 // 0=reserved, 1=L3, 2=L2, 3=L1
    if (version == 1 || layerBits == 0) return None
    val layer = 4 - layerBits
    val brIdx = (h >>> 12) & 0xf
    val srIdx = (h >>> 10) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/reserved
    val padding = (h >>> 9) & 1
    val mode = (h >>> 6) & 3
    val sr = (version match {
      case 3 => RatesV1
      case 2 => RatesV2
      case _ => RatesV25
    })(srIdx)
    val kbps = (version, layer) match {
      case (3, 1) => V1L1(brIdx)
      case (3, 2) => V1L2(brIdx)
      case (3, 3) => V1L3(brIdx)
      case (_, 1) => V2L1(brIdx)
      case _ => V2L23(brIdx)
    }
    val samples = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (version == 3) 1152 else 576
    }
    val size = layer match {
      case 1 => (12000 * kbps / sr + padding) * 4
      case _ => samples / 8 * 1000 * kbps / sr + padding
    }
    if (size < 4) return None
    Some(Frame(version, layer, sr, kbps,
      channels = if (mode == 3) 1 else 2, samples, size))
  }

  /** Skip a leading ID3v2 tag: "ID3", 2 version bytes, flags, 4-byte
    * SYNCSAFE size (7 bits per byte), the tag body, and — when the v2.4
    * footer flag (0x10) is set — the 10-byte footer the size excludes. */
  private def skipId3v2(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
      (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 && (b(8) & 0x80) == 0 && (b(9) & 0x80) == 0) {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val footer = if ((b(5) & 0x10) != 0) 10 else 0
      math.min(b.length, 10 + size + footer)
    } else 0

  /** How far past the tag to hunt for the first CHAINING sync — tag
    * editors leave padding/null gaps and stream rips start mid-frame;
    * bounded so a giant non-audio blob classifies in O(bound). */
  private val ResyncWindow = 128 * 1024

  /** Metadata for an MPEG audio stream, or None when the payload is not
    * one. Frames must CHAIN (each header sits exactly where the previous
    * frame's size points) and agree on version/layer/rate/channels. */
  def audioMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (bytes == null) return None
      // resync scan: the first frame need not sit exactly at the tag end
      // (padding gaps, stream rips starting mid-frame); a candidate sync
      // only counts when it CHAINS to a consistent second frame, so the
      // scan cannot lock onto a lone sync in noise
      val tagEnd = skipId3v2(bytes)
      val scanEnd = math.min(bytes.length.toLong, tagEnd.toLong + ResyncWindow).toInt
      var p = tagEnd
      var first: Frame = null
      while (first == null && p < scanEnd) {
        frameAt(bytes, p) match {
          case Some(f) if p + f.sizeBytes <= bytes.length &&
              frameAt(bytes, p + f.sizeBytes).exists(g =>
                g.version == f.version && g.layer == f.layer &&
                  g.sampleRate == f.sampleRate && g.channels == f.channels) =>
            first = f
          case _ => p += 1
        }
      }
      if (first == null) return None
      var frames = 0
      var kbpsSum = 0L
      var samplesSum = 0L
      var maxSize = first.sizeBytes
      var vbr = false
      var ok = true
      while (ok) {
        frameAt(bytes, p) match {
          // the WHOLE frame must be present: a header whose payload was
          // truncated is a partial frame, not listenable audio — it falls
          // into the trailing-slack allowance instead of the count
          case Some(f) if f.version == first.version && f.layer == first.layer &&
              f.sampleRate == first.sampleRate && f.channels == first.channels &&
              p + f.sizeBytes <= bytes.length =>
            frames += 1
            kbpsSum += f.bitrateKbps
            samplesSum += f.samples
            if (f.sizeBytes > maxSize) maxSize = f.sizeBytes
            if (f.bitrateKbps != first.bitrateKbps) vbr = true
            p += f.sizeBytes
          case _ => ok = false
        }
      }
      if (frames < MinFrames) return None
      // trailing slack: an ID3v1 tag (128 bytes) or sub-frame junk is
      // normal; more unparsed bytes than the LARGEST frame + tag (a VBR
      // tail can be bigger than the first frame) means this is not a
      // clean MPEG stream — classify rather than under-report duration
      if (bytes.length - p > maxSize + 128) return None
      val durationMs = samplesSum * 1000L / first.sampleRate
      Some(Meta(
        version = first.version match {
          case 3 => "MPEG1"
          case 2 => "MPEG2"
          case _ => "MPEG2.5"
        },
        layer = first.layer,
        sampleRate = first.sampleRate,
        channels = first.channels,
        frames = frames,
        bitrateKbps = (kbpsSum / frames).toInt,
        durationMs = durationMs,
        vbr = vbr))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fixture-side frame synthesis (headers + zero payloads — VALID frame
    * chains with no audible content; the metadata walk never looks past
    * the headers). MPEG1 Layer III only, no padding, optional ID3v2. */
  def encodeFrames(nFrames: Int, srIdx: Int, brIdx: Int, mono: Boolean,
      id3v2Bytes: Int = 0): Array[Byte] = {
    require(nFrames >= 1 && srIdx >= 0 && srIdx <= 2 && brIdx >= 1 && brIdx <= 14)
    val sr = RatesV1(srIdx)
    val kbps = V1L3(brIdx)
    val size = 144000 * kbps / sr
    val bos = new java.io.ByteArrayOutputStream()
    if (id3v2Bytes > 0) { // syncsafe-sized leading tag
      require(id3v2Bytes < (1 << 28))
      bos.write('I'); bos.write('D'); bos.write('3'); bos.write(4); bos.write(0)
      bos.write(0) // flags
      bos.write((id3v2Bytes >> 21) & 0x7f); bos.write((id3v2Bytes >> 14) & 0x7f)
      bos.write((id3v2Bytes >> 7) & 0x7f); bos.write(id3v2Bytes & 0x7f)
      (0 until id3v2Bytes).foreach(_ => bos.write(0))
    }
    (0 until nFrames).foreach { _ =>
      bos.write(0xff); bos.write(0xfb) // sync + MPEG1 + LayerIII + no CRC
      bos.write((brIdx << 4) | (srIdx << 2)) // no padding, not private
      bos.write(if (mono) 0xc0 else 0x00) // mono vs stereo, no flags
      (4 until size).foreach(_ => bos.write(0))
    }
    bos.toByteArray
  }
}
