package graft.functions

import java.awt.image.BufferedImage
import java.nio.charset.StandardCharsets

/** Real video decode for the one public container format that needs no
  * codec: YUV4MPEG2 ("Y4M", the uncompressed frame-interchange format of
  * mjpegtools/ffmpeg, `y4m(5)`). The reference's converter plugin registry
  * (`src/converters/base.py:10-27`) dispatches payload decoders by format;
  * compressed codecs (h264/vp9/…) stay behind the clearly-marked stub
  * because no codec library ships in this container — but Y4M is plain
  * header text + raw planar YCbCr, fully decodable in pure JVM integer
  * math, so the video path gets a REAL decoder for it.
  *
  * Stream layout (public spec):
  * {{{
  *   "YUV4MPEG2" (SP param)* "\n"          — stream header
  *   ( "FRAME" (SP param)* "\n" planes )*  — per frame: Y, then Cb, then Cr
  * }}}
  * Params: `W<width> H<height> F<num>:<den> I<p|t|b|m> A<n>:<d> C<space>
  * X<comment>`. Chroma modes handled: `C420`/`C420jpeg`/`C420mpeg2`/
  * `C420paldv` (all 4:2:0 — siting differences are sub-pixel, irrelevant to
  * nearest-sample upsampling), `C422`, `C444`, `Cmono`. Default when no `C`
  * param is present is 4:2:0 (spec: `C420jpeg`).
  *
  * Color math is ITU-R BT.601 limited-range (the Y4M convention), integer
  * only, so decode is bit-deterministic across JVMs:
  * {{{
  *   c = y-16, d = cb-128, e = cr-128
  *   R = clamp((298c         + 409e + 128) >> 8)
  *   G = clamp((298c - 100d - 208e + 128) >> 8)
  *   B = clamp((298c + 516d        + 128) >> 8)
  * }}}
  *
  * Contract matches [[ImageOps.decode]]: malformed/truncated/null payloads
  * yield `None`/empty — never a throw. At 100 TB a corrupt video row is
  * routine input; it must CLASSIFY as invalid, not abort the stage.
  */
object Y4m {

  /** Parsed stream: dims + normalized chroma mode + the byte offset of each
    * complete frame's plane data. Offsets into the original payload, not
    * copies — sampling k frames from an m-frame payload converts k frames,
    * never m. A trailing partial frame (truncated payload) is dropped. */
  final case class Parsed(w: Int, h: Int, chroma: String, frameOffsets: IndexedSeq[Int]) {
    def frameCount: Int = frameOffsets.length
  }

  /** (luma plane bytes, one chroma plane bytes) for a frame — LONG math:
    * a hostile header like `W65536 H32768` overflows Int w·h negative,
    * which would pass the per-frame fit check and drive the walk to a
    * negative index (an ArrayIndexOutOfBounds throw, violating the
    * never-throw contract). In Long the oversized frame simply fails the
    * fit check and classifies as zero decodable frames. */
  private def planeSizes(w: Int, h: Int, chroma: String): (Long, Long) = {
    val y = w.toLong * h
    chroma match {
      case "420"  => (y, (w / 2).toLong * (h / 2))
      case "422"  => (y, (w / 2).toLong * h)
      case "444"  => (y, y)
      case "mono" => (y, 0L)
    }
  }

  private def indexOfByte(bytes: Array[Byte], b: Byte, from: Int): Int = {
    var i = from
    while (i < bytes.length) { if (bytes(i) == b) return i; i += 1 }
    -1
  }

  def parse(bytes: Array[Byte]): Option[Parsed] = {
    val magic = "YUV4MPEG2"
    if (bytes == null || bytes.length < magic.length) return None
    var i = 0
    while (i < magic.length) {
      if (bytes(i) != magic.charAt(i).toByte) return None
      i += 1
    }
    val nl = indexOfByte(bytes, '\n', magic.length)
    if (nl < 0) return None
    val header = new String(bytes, magic.length, nl - magic.length, StandardCharsets.US_ASCII)
    var w = -1; var h = -1; var chroma = "420" // spec default C420jpeg
    header.split(' ').foreach { tok =>
      if (tok.nonEmpty) tok.charAt(0) match {
        case 'W' => w = tok.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = tok.drop(1).toIntOption.getOrElse(-1)
        case 'C' => tok.drop(1) match {
          case "420" | "420jpeg" | "420mpeg2" | "420paldv" => chroma = "420"
          case "422"  => chroma = "422"
          case "444"  => chroma = "444"
          case "mono" => chroma = "mono"
          case _      => return None // 411/444alpha/unknown: unsupported, classify
        }
        case _ => () // F/I/A/X params don't affect pixel decode
      }
    }
    if (w <= 0 || h <= 0) return None
    // subsampled chroma needs even dims (ffmpeg rejects odd 4:2:0 too);
    // reject rather than mis-size the planes
    if (chroma == "420" && (w % 2 != 0 || h % 2 != 0)) return None
    if (chroma == "422" && w % 2 != 0) return None
    val (ySize, cSize) = planeSizes(w, h, chroma)
    val frameBytes = ySize + 2L * cSize
    val offsets = IndexedSeq.newBuilder[Int]
    var pos = nl + 1
    var ok = true
    while (ok && pos < bytes.length) {
      // each frame starts with a "FRAME"[ params]"\n" line
      val marker = "FRAME"
      var j = 0
      var matches = pos + marker.length <= bytes.length
      while (matches && j < marker.length) {
        if (bytes(pos + j) != marker.charAt(j).toByte) matches = false
        j += 1
      }
      if (!matches) ok = false
      else {
        val fnl = indexOfByte(bytes, '\n', pos + marker.length)
        if (fnl < 0 || fnl + frameBytes > bytes.length) ok = false // truncated: drop
        else {
          offsets += (fnl + 1)
          pos = fnl + 1 + frameBytes.toInt
        }
      }
    }
    Some(Parsed(w, h, chroma, offsets.result()))
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Decode frame `idx` to RGB. BT.601 limited-range, nearest-sample chroma
    * upsampling (4:2:0 sample at (x/2, y/2); 4:2:2 at (x/2, y)). */
  def frame(bytes: Array[Byte], p: Parsed, idx: Int): BufferedImage = {
    val (ySize, cSize) = planeSizes(p.w, p.h, p.chroma)
    val off = p.frameOffsets(idx)
    // safe narrowing: parse only records offsets whose whole frame fits in
    // the array, so ySize/cSize ≤ bytes.length ≤ Int.MaxValue here
    val cbOff = off + ySize.toInt
    val crOff = cbOff + cSize.toInt
    val img = new BufferedImage(p.w, p.h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](p.w * p.h)
    var y = 0
    while (y < p.h) {
      var x = 0
      while (x < p.w) {
        val luma = bytes(off + y * p.w + x) & 0xff
        var cb = 128; var cr = 128
        p.chroma match {
          case "420" =>
            val ci = (y / 2) * (p.w / 2) + (x / 2)
            cb = bytes(cbOff + ci) & 0xff; cr = bytes(crOff + ci) & 0xff
          case "422" =>
            val ci = y * (p.w / 2) + (x / 2)
            cb = bytes(cbOff + ci) & 0xff; cr = bytes(crOff + ci) & 0xff
          case "444" =>
            val ci = y * p.w + x
            cb = bytes(cbOff + ci) & 0xff; cr = bytes(crOff + ci) & 0xff
          case "mono" => ()
        }
        val c = luma - 16; val d = cb - 128; val e = cr - 128
        val r = clamp((298 * c + 409 * e + 128) >> 8)
        val g = clamp((298 * c - 100 * d - 208 * e + 128) >> 8)
        val b = clamp((298 * c + 516 * d + 128) >> 8)
        px(y * p.w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, p.w, p.h, px, 0, p.w)
    img
  }

  /** First frame, or null (the [[graft.sources.PayloadDecoder]] null-decode
    * contract: undecodable classifies, never crashes). */
  def decodeFirstFrame(bytes: Array[Byte]): BufferedImage =
    parse(bytes) match {
      case Some(p) if p.frameCount > 0 => frame(bytes, p, 0)
      case _                           => null
    }

  /** Evenly-spaced sample of up to `n` DISTINCT frames (floor-spaced index
    * `j*m/k`, the standard decimation rule): sampling 3 of 9 frames decodes
    * frames 0, 3, 6 — and only those. Empty for undecodable payloads. */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[BufferedImage] =
    sampleFramesIndexed(bytes, n).map(_._2)

  /** [[sampleFrames]] with each frame's SOURCE index in the stream —
    * consumers that position frames (timestamp = idx/fps, per-frame
    * metadata joins, re-seeks) need the real decimation position, not the
    * sample ordinal: sampling 2 of 10 frames yields indices 0 and 5. */
  def sampleFramesIndexed(bytes: Array[Byte], n: Int): Seq[(Int, BufferedImage)] =
    parse(bytes) match {
      case Some(p) if p.frameCount > 0 && n > 0 =>
        VideoContainers.floorSpacedIndices(p.frameCount, n)
          .map(idx => (idx, frame(bytes, p, idx)))
      case _ => Seq.empty
    }

  /** Single-frame `C444` encode (full resolution, no subsampling loss) with
    * the inverse BT.601 limited-range matrix. Integer rounding bounds the
    * round-trip error at ±2/channel — comfortably above the 40 dB lossy
    * gate — so the decoder registers `lossless = false`. */
  def encodeFrame(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\nFRAME\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val yOff = header.length; val cbOff = yOff + w * h; val crOff = cbOff + w * h
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      out(yOff + i) = (((66 * r + 129 * g + 25 * b + 128) >> 8) + 16).toByte
      out(cbOff + i) = clamp(((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128).toByte
      out(crOff + i) = clamp(((112 * r - 94 * g - 18 * b + 128) >> 8) + 128).toByte
      i += 1
    }
    out
  }
}
