package graft.functions

/** IVF container metadata — the simple framing VP8/VP9/AV1 streams ship
  * in for testing and archival (libvpx/libaom's native container; the
  * format WebM tooling and codec conformance suites exchange). Header:
  * `DKIF`, version u16, header length u16, codec fourcc, width u16,
  * height u16, timebase denominator u32, numerator u32, frame count
  * u32, reserved; then per frame: size u32 + pts u64 + payload. All
  * little-endian. The walk verifies the declared frame count against
  * the actual frame chain and computes duration from the timebase and
  * LAST pts — the declared count lies in the wild (libvpx writes it
  * after the fact); the chain is the truth.
  *
  * Codec payload decode (VP9/AV1 sample reconstruction) stays behind
  * the honest stub; this owns the container. */
object Ivf {

  final case class Meta(
      codec: String, // "vp80" | "vp90" | "av01" | raw fourcc
      width: Int,
      height: Int,
      nFrames: Int, // walked, not declared
      declaredFrames: Int,
      durationMs: Long, // from last pts + timebase; -1 if timebase degenerate
      countsAgree: Boolean)

  def isIvf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 32 &&
      bytes(0) == 'D' && bytes(1) == 'K' && bytes(2) == 'I' && bytes(3) == 'F'

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def le64(b: Array[Byte], p: Int): Long =
    le32(b, p) | (le32(b, p + 4) << 32)

  def videoMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isIvf(bytes)) return None
      val headerLen = le16(bytes, 6)
      if (headerLen < 32 || headerLen > bytes.length) return None
      val fourcc = new String(bytes, 8, 4, "US-ASCII").toLowerCase
      val width = le16(bytes, 12)
      val height = le16(bytes, 14)
      val den = le32(bytes, 16) // timebase denominator (rate)
      val num = le32(bytes, 20) // timebase numerator (scale)
      val declared = le32(bytes, 24).toInt
      if (width <= 0 || height <= 0) return None
      var pos = headerLen
      var n = 0
      var lastPts = -1L
      while (pos < bytes.length) {
        if (pos + 12 > bytes.length) return None // truncated frame header
        val size = le32(bytes, pos)
        if (size < 0 || size > Int.MaxValue - 16) return None
        val pts = le64(bytes, pos + 4)
        if (pos + 12 + size > bytes.length) return None // lying size
        if (pts > lastPts) lastPts = pts
        n += 1
        if (n > (1 << 22)) return None
        pos += 12 + size.toInt
      }
      if (n == 0) return None
      val durationMs =
        if (den > 0 && num > 0 && lastPts >= 0)
          (lastPts + 1) * num * 1000L / den
        else -1L
      Some(Meta(fourcc, width, height, n, declared, durationMs,
        declared == n))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Serialize an IVF for fixtures: `frameSizes(i)` zero-filled frames
    * at pts=i. `declared` lets fixtures emit the lying-count shape. */
  def encode(fourcc: String, width: Int, height: Int, den: Int, num: Int,
      frameSizes: Vector[Int], declared: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val h = new Array[Byte](32)
    h(0) = 'D'; h(1) = 'K'; h(2) = 'I'; h(3) = 'F'
    // version 0 at 4-5
    h(6) = 32; // header length
    fourcc.toUpperCase.getBytes("US-ASCII").copyToArray(h, 8)
    wle16(h, 12, width); wle16(h, 14, height)
    wle32(h, 16, den); wle32(h, 20, num)
    wle32(h, 24, declared)
    out.write(h)
    frameSizes.zipWithIndex.foreach { case (sz, i) =>
      val fh = new Array[Byte](12)
      wle32(fh, 0, sz)
      wle32(fh, 4, i); // pts low word (fixtures stay < 2^31)
      out.write(fh)
      out.write(new Array[Byte](sz))
    }
    out.toByteArray
  }

  private def wle16(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
  }
  private def wle32(b: Array[Byte], p: Int, v: Long): Unit = {
    b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
    b(p + 2) = ((v >> 16) & 0xff).toByte; b(p + 3) = ((v >> 24) & 0xff).toByte
  }
}
