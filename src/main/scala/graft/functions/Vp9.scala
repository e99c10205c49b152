package graft.functions

/** VP9 keyframe uncompressed-header metadata (the libvpx bitstream
  * spec §6.2) — the dims a VP9 stream ACTUALLY decodes to, read from
  * the first keyframe's fixed-layout header rather than trusted from
  * the container (IVF/WebM headers routinely disagree with the
  * bitstream after transcodes; the bitstream wins). Parsed: frame
  * marker, profile bits, the 0x49 83 42 keyframe sync code, color
  * config (bit depth / color space / range / subsampling by profile),
  * and frame_size (width/height minus-1, 16 bits each). Tile/loop
  * filter/compressed-header decode stays behind the honest stub.
  *
  * Never throws; non-keyframes and non-VP9 payloads classify None. */
object Vp9 {

  final case class KeyframeMeta(
      profile: Int,
      bitDepth: Int,
      colorSpace: Int,
      subsamplingX: Int,
      subsamplingY: Int,
      width: Int,
      height: Int)

  private final class Bits(b: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= b.length * 8) sys.error("overrun")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  private val CsRgb = 7

  def keyframeMeta(payload: Array[Byte]): Option[KeyframeMeta] =
    try {
      // a profile-0 keyframe header is 69 bits = 9 bytes; the bit
      // reader's overrun guard handles anything shorter field-by-field
      if (payload == null || payload.length < 9) return None
      val r = new Bits(payload)
      if (r.u(2) != 2) return None // frame_marker
      val profile = r.u(1) | (r.u(1) << 1) // low bit first
      if (profile == 3 && r.u(1) != 0) return None // reserved_zero
      if (r.u(1) == 1) return None // show_existing_frame: not a coded frame
      val frameType = r.u(1)
      r.u(1) // show_frame
      r.u(1) // error_resilient_mode
      if (frameType != 0) return None // inter frame: dims live elsewhere
      if (r.u(24) != 0x498342) return None // frame_sync_code
      // color_config
      val bitDepth =
        if (profile >= 2) { if (r.u(1) == 1) 12 else 10 }
        else 8
      val colorSpace = r.u(3)
      var (sx, sy) = (1, 1)
      if (colorSpace != CsRgb) {
        r.u(1) // color_range
        if (profile == 1 || profile == 3) {
          sx = r.u(1); sy = r.u(1)
          if (r.u(1) != 0) return None // reserved_zero
        }
      } else {
        if (profile == 1 || profile == 3) {
          sx = 0; sy = 0
          if (r.u(1) != 0) return None
        } else return None // RGB requires profile 1/3
      }
      if (colorSpace != CsRgb && !(profile == 1 || profile == 3)) {
        sx = 1; sy = 1 // profiles 0/2 are always 4:2:0
      }
      val width = r.u(16) + 1
      val height = r.u(16) + 1
      Some(KeyframeMeta(profile, bitDepth, colorSpace, sx, sy, width, height))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The first IVF frame's VP9 keyframe header, when the container says
    * vp90 — plus whether the container header AGREES with the
    * bitstream dims (it lies in the wild; the bitstream wins). */
  def fromIvf(bytes: Array[Byte]): Option[(KeyframeMeta, Boolean)] =
    Ivf.videoMeta(bytes).filter(_.codec == "vp90").flatMap { container =>
      // first frame payload starts right after the 32-byte header + 12-byte frame header
      val headerLen = 32
      if (bytes.length < headerLen + 12) return None
      val size = ((bytes(headerLen) & 0xffL) |
        ((bytes(headerLen + 1) & 0xffL) << 8) |
        ((bytes(headerLen + 2) & 0xffL) << 16) |
        ((bytes(headerLen + 3) & 0xffL) << 24)).toInt
      if (headerLen + 12 + size > bytes.length) return None
      val payload = java.util.Arrays.copyOfRange(
        bytes, headerLen + 12, headerLen + 12 + size)
      keyframeMeta(payload).map { m =>
        (m, m.width == container.width && m.height == container.height)
      }
    }

  /** Serialize a profile-0 4:2:0 keyframe header for fixtures. */
  def encodeKeyframeHeader(width: Int, height: Int,
      colorSpace: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    def u(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { out.write(acc); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    u(2, 2) // frame_marker
    u(1, 0); u(1, 0) // profile 0
    u(1, 0) // show_existing_frame
    u(1, 0) // frame_type = KEY
    u(1, 1) // show_frame
    u(1, 0) // error_resilient
    u(24, 0x498342)
    u(3, colorSpace)
    u(1, 0) // color_range
    u(16, width - 1)
    u(16, height - 1)
    u(1, 0) // render_size_different
    while (nbits != 0) u(1, 0)
    out.toByteArray
  }
}
