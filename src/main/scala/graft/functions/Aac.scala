package graft.functions

/** ADTS/AAC metadata walk (ISO/IEC 13818-7 / 14496-3 ADTS framing) —
  * the web's dominant audio codec. Like MP3 ([[Mpeg]]), ADTS has no
  * file magic: a stream is a CHAIN of frames, each starting with a
  * 12-bit 0xFFF syncword and carrying its own byte length, so the walk
  * self-validates — a syncword that doesn't chain into the next
  * frame's syncword is noise, not audio. This extracts everything a
  * training pipeline triages on WITHOUT sample decode (profile,
  * sample rate, channels, frame count, duration, bitrate class);
  * AAC sample decode needs a codec library the container doesn't ship
  * and stays behind the honest stub in the decoder registry.
  *
  * Grammar (fixed header, 28 bits + protection): syncword[12]=0xFFF,
  * ID[1], layer[2]=00, protection_absent[1], profile[2],
  * sampling_frequency_index[4], private[1], channel_configuration[3],
  * original[1], home[1]; variable header: copyright bits[2],
  * aac_frame_length[13] (header + CRC + raw blocks),
  * adts_buffer_fullness[11], number_of_raw_data_blocks_in_frame[2];
  * optional CRC[16] when protection_absent=0. Each frame carries
  * 1024 output samples per raw data block.
  *
  * Never throws; needs ≥3 chaining frames to classify as AAC (the
  * same anti-false-positive posture as the MP3 walk). */
object Aac {

  val SampleRates: Array[Int] = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350, -1, -1, -1)

  val Profiles: Array[String] = Array("main", "lc", "ssr", "ltp")

  final case class Meta(
      profile: String,
      sampleRate: Int,
      channels: Int,
      nFrames: Int,
      durationMs: Long,
      crcProtected: Boolean,
      mpeg2: Boolean)

  private val MinChainFrames = 3
  private val MaxFrames = 1 << 20

  def audioMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (bytes == null || bytes.length < 7 * MinChainFrames) return None
      // resync like a real demuxer: try the first few offsets, take the
      // first position where a full chain walks to EOF
      var start = 0
      val scanCap = math.min(bytes.length - 7, 4096)
      while (start <= scanCap) {
        if ((bytes(start) & 0xff) == 0xff && (bytes(start + 1) & 0xf6) == 0xf0) {
          walkChain(bytes, start) match {
            case Some(m) => return Some(m)
            case None =>
          }
        }
        start += 1
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  private def walkChain(bytes: Array[Byte], start: Int): Option[Meta] = {
    var pos = start
    var nFrames = 0
    var blocks = 0L
    var profile = -1
    var srIdx = -1
    var channels = -1
    var crc = false
    var mpeg2 = false
    var maxFrameLen = 0
    // trailing slack after the last full frame — an ID3v1 tag (128-byte
    // "TAG") or sub-frame junk — is tolerated like the MP3 walk's
    // maxSize+128 rule; anything larger is a broken chain
    def slackOk(p: Int): Boolean =
      nFrames >= MinChainFrames && bytes.length - p <= maxFrameLen + 128
    while (pos + 7 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff || (bytes(pos + 1) & 0xf6) != 0xf0) {
        if (slackOk(pos)) {
          val sr0 = SampleRates(srIdx)
          return Some(Meta(Profiles(profile), sr0, channels, nFrames,
            blocks * 1024L * 1000L / sr0, crc, mpeg2))
        }
        return None // chain broken mid-stream
      }
      val id = (bytes(pos + 1) >> 3) & 1
      val protAbsent = bytes(pos + 1) & 1
      val prof = (bytes(pos + 2) >> 6) & 3
      val sfi = (bytes(pos + 2) >> 2) & 0xf
      val ch = ((bytes(pos + 2) & 1) << 2) | ((bytes(pos + 3) >> 6) & 3)
      val frameLen = ((bytes(pos + 3) & 0x03) << 11) |
        ((bytes(pos + 4) & 0xff) << 3) | ((bytes(pos + 5) >> 5) & 7)
      val rawBlocks = (bytes(pos + 6) & 3) + 1
      if (frameLen < 7 || SampleRates(sfi) <= 0 || ch == 0) return None
      if (pos + frameLen > bytes.length) {
        // truncated FINAL frame: never counted — like the MP3 walk it
        // falls into the trailing-slack allowance (or rejects the chain)
        if (slackOk(pos)) {
          val sr0 = SampleRates(srIdx)
          return Some(Meta(Profiles(profile), sr0, channels, nFrames,
            blocks * 1024L * 1000L / sr0, crc, mpeg2))
        }
        return None
      }
      if (nFrames == 0) {
        profile = prof; srIdx = sfi; channels = ch
        crc = protAbsent == 0; mpeg2 = id == 1
      } else if (prof != profile || sfi != srIdx || ch != channels)
        return None // a real stream never flips these mid-chain
      blocks += rawBlocks
      nFrames += 1
      if (nFrames > MaxFrames) return None
      if (frameLen > maxFrameLen) maxFrameLen = frameLen
      pos += frameLen
    }
    if (nFrames < MinChainFrames) return None
    if (pos != bytes.length && !slackOk(pos)) return None
    val sr = SampleRates(srIdx)
    Some(Meta(Profiles(profile), sr, channels, nFrames,
      blocks * 1024L * 1000L / sr, crc, mpeg2))
  }

  /** Serialize ADTS frames for fixtures/tests: deterministic headers,
    * zero-filled raw data of `payloadLens(i)` bytes per frame. */
  def encode(profile: Int, srIdx: Int, channels: Int,
      payloadLens: Vector[Int], withCrc: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    payloadLens.foreach { pl =>
      val headerLen = if (withCrc) 9 else 7
      val frameLen = headerLen + pl
      val h = new Array[Byte](headerLen)
      h(0) = 0xff.toByte
      h(1) = (0xf0 | (if (withCrc) 0 else 1)).toByte // MPEG-4 (ID=0), layer 00
      h(2) = ((profile << 6) | (srIdx << 2) | ((channels >> 2) & 1)).toByte
      h(3) = (((channels & 3) << 6) | ((frameLen >> 11) & 3)).toByte
      h(4) = ((frameLen >> 3) & 0xff).toByte
      h(5) = (((frameLen & 7) << 5) | 0x1f).toByte // buffer fullness high bits (VBR 0x7FF)
      h(6) = 0xfc.toByte // fullness low + 1 raw block (field value 0)
      out.write(h)
      if (withCrc) { /* bytes 7-8 are the CRC field, zero in fixtures */ }
      out.write(new Array[Byte](pl))
    }
    out.toByteArray
  }
}
