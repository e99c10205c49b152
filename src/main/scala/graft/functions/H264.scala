package graft.functions

/** H.264/AVC sequence-parameter-set metadata (ITU-T H.264 §7.3.2.1) —
  * the web's dominant video codec. Sample decode (CABAC/CAVLC, intra
  * prediction, deblocking) needs a codec library and stays behind the
  * honest stub in the decoder registry, but the STREAM-LEVEL grammar a
  * pipeline triages on is implementable exactly and is here: Annex-B
  * NAL scan (00 00 01 start codes), RBSP un-escaping (the
  * 00 00 03 emulation-prevention byte — load-bearing, not decorative:
  * any SPS whose payload contains two zero bytes carries one), a real
  * exp-Golomb bit reader (ue(v)/se(v)), and the full SPS parse
  * including the high-profile chroma/bit-depth/scaling-list branch and
  * the frame-cropping arithmetic that turns macroblock counts into the
  * true display dims (1080 = 1088 − 8 cropped rows — any reader
  * without the crop math reports every 1080p video as 1088 tall).
  *
  * Never throws; truncated/corrupt/non-H264 payloads classify None. */
object H264 {

  final case class Sps(
      profileIdc: Int,
      levelIdc: Int,
      width: Int,
      height: Int,
      chromaFormatIdc: Int, // 1 = 4:2:0 (the default when not coded)
      bitDepthLuma: Int,
      frameMbsOnly: Boolean,
      cropped: Boolean)

  /** A bounded RBSP bit reader. Throws internally on overrun; callers
    * wrap in the module's never-throw contract. */
  private final class BitReader(rbsp: Array[Byte]) {
    private var pos = 0
    def u1(): Int = {
      if (pos >= rbsp.length * 8) sys.error("overrun")
      val b = (rbsp(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        if (zeros > 31) sys.error("malformed exp-golomb")
      }
      ((1 << zeros) - 1) + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Strip emulation-prevention bytes: 00 00 03 -> 00 00. */
  def unescapeRbsp(nal: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(to - from)
    var i = from
    var zeros = 0
    while (i < to) {
      val b = nal(i) & 0xff
      if (zeros >= 2 && b == 3) {
        zeros = 0 // drop the emulation-prevention byte
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private val HighProfiles = Set(100, 110, 122, 244, 44, 83, 86, 118, 128,
    138, 139, 134, 135)

  /** Parse one SPS RBSP (the payload AFTER the NAL header byte). */
  def parseSps(rbsp: Array[Byte]): Option[Sps] =
    try {
      val r = new BitReader(rbsp)
      val profileIdc = r.u(8)
      r.u(8) // constraint_set flags + reserved
      val levelIdc = r.u(8)
      r.ue() // seq_parameter_set_id
      var chromaFormatIdc = 1
      var separateColourPlane = false
      var bitDepthLuma = 8
      if (HighProfiles.contains(profileIdc)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) separateColourPlane = r.u1() == 1
        bitDepthLuma = 8 + r.ue()
        r.ue() // bit_depth_chroma_minus8
        r.u1() // qpprime_y_zero_transform_bypass_flag
        if (r.u1() == 1) { // seq_scaling_matrix_present_flag
          val n = if (chromaFormatIdc == 3) 12 else 8
          for (i <- 0 until n if r.u1() == 1) // seq_scaling_list_present[i]
            skipScalingList(r, if (i < 6) 16 else 64)
        }
      }
      r.ue() // log2_max_frame_num_minus4
      r.ue() match { // pic_order_cnt_type
        case 0 => r.ue() // log2_max_pic_order_cnt_lsb_minus4
        case 1 =>
          r.u1() // delta_pic_order_always_zero_flag
          r.se(); r.se()
          val n = r.ue() // num_ref_frames_in_pic_order_cnt_cycle
          if (n < 0 || n > 255) sys.error("bad poc cycle")
          for (_ <- 0 until n) r.se()
        case _ =>
      }
      r.ue() // max_num_ref_frames
      r.u1() // gaps_in_frame_num_value_allowed_flag
      val widthMbs = r.ue() + 1
      val heightMapUnits = r.ue() + 1
      val frameMbsOnly = r.u1() == 1
      if (!frameMbsOnly) r.u1() // mb_adaptive_frame_field_flag
      r.u1() // direct_8x8_inference_flag
      val cropping = r.u1() == 1
      var (cl, cr, ct, cb) = (0, 0, 0, 0)
      if (cropping) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
      // §7.4.2.1.1 crop units: SubWidthC/SubHeightC by chroma format,
      // 1/1 for monochrome or separate colour planes
      val (subW, subH) = chromaFormatIdc match {
        case 1 => (2, 2) // 4:2:0
        case 2 => (2, 1) // 4:2:2
        case _ => (1, 1) // monochrome / 4:4:4
      }
      val (cropUnitX, cropUnitY) =
        if (chromaFormatIdc == 0 || separateColourPlane)
          (1, 2 - (if (frameMbsOnly) 1 else 0))
        else (subW, subH * (2 - (if (frameMbsOnly) 1 else 0)))
      val width = widthMbs * 16 - cropUnitX * (cl + cr)
      val height = (if (frameMbsOnly) 1 else 2) * heightMapUnits * 16 -
        cropUnitY * (ct + cb)
      if (width <= 0 || height <= 0 || width > 16384 || height > 16384) None
      else Some(Sps(profileIdc, levelIdc, width, height, chromaFormatIdc,
        bitDepthLuma, frameMbsOnly, cropping))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var lastScale = 8
    var nextScale = 8
    var j = 0
    while (j < size) {
      if (nextScale != 0) {
        val delta = r.se()
        nextScale = (lastScale + delta + 256) % 256
      }
      lastScale = if (nextScale == 0) lastScale else nextScale
      j += 1
    }
  }

  /** Find the first SPS NAL (type 7) in an Annex-B stream and parse it. */
  def spsMeta(bytes: Array[Byte]): Option[Sps] =
    try {
      if (bytes == null || bytes.length < 8) return None
      var i = 0
      val n = bytes.length
      while (i + 4 < n) {
        // 00 00 01 start code (with optional extra leading 00)
        if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
          val hdr = bytes(i + 3) & 0xff
          if ((hdr & 0x80) == 0 && (hdr & 0x1f) == 7) {
            // NAL extends to the next start code or EOF
            var end = i + 4
            while (end + 2 < n &&
                !(bytes(end) == 0 && bytes(end + 1) == 0 &&
                  (bytes(end + 2) == 1 ||
                    (end + 3 < n && bytes(end + 2) == 0 && bytes(end + 3) == 1))))
              end += 1
            val stop = if (end + 2 >= n) n else end
            return parseSps(unescapeRbsp(bytes, i + 4, stop))
          }
          i += 3
        } else i += 1
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // Fixture/test writer: a bit writer + SPS serializer + Annex-B
  // wrapping WITH emulation-prevention insertion, so the reader's
  // un-escape path is exercised by construction.
  // ------------------------------------------------------------------

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def u(n: Int, v: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { out.write(acc); acc = 0; nbits = 0 }
        i -= 1
      }
      this
    }
    def ue(v: Int): this.type = {
      val code = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(code)
      u(len - 1, 0); u(len, code)
    }
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit + zero-pad to a byte. */
    def finishRbsp(): Array[Byte] = {
      u(1, 1)
      while (nbits != 0) u(1, 0)
      out.toByteArray
    }
  }

  /** Insert emulation-prevention bytes (00 00 {00,01,02,03} -> 00 00 03 xx). */
  def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xff) <= 3) {
        out.write(3)
        zeros = 0
      }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Serialize a baseline-profile SPS for (width, height) with crop when
    * the dims aren't macroblock-aligned, wrapped as one Annex-B NAL. */
  def encodeSps(width: Int, height: Int, levelIdc: Int = 31): Array[Byte] = {
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    val cropRight = (wMbs * 16 - width) / 2 // CropUnitX=2 for 4:2:0
    val cropBottom = (hMbs * 16 - height) / 2
    val w = new BitWriter
    w.u(8, 66) // profile_idc baseline
    w.u(8, 0xc0) // constraint_set0/1
    w.u(8, levelIdc)
    w.ue(0) // sps_id
    w.ue(4) // log2_max_frame_num_minus4
    w.ue(0) // pic_order_cnt_type
    w.ue(4) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1) // max_num_ref_frames
    w.u(1, 0) // gaps_in_frame_num
    w.ue(wMbs - 1)
    w.ue(hMbs - 1)
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8_inference
    val crop = cropRight > 0 || cropBottom > 0
    w.u(1, if (crop) 1 else 0)
    if (crop) { w.ue(0); w.ue(cropRight); w.ue(0); w.ue(cropBottom) }
    val rbsp = escapeRbsp(w.finishRbsp())
    Array[Byte](0, 0, 0, 1, 0x67) ++ rbsp
  }
}
