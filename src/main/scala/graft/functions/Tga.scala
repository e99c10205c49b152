package graft.functions

import java.awt.image.BufferedImage

/** Real TGA (Truevision Targa) decode — the texture/asset format game
  * and 3D crawls fetch constantly and the JDK has NO reader for. Public
  * layout (Truevision TGA spec v2):
  *
  *  - 18-byte header: id length, color-map type, image type (1/2/3 raw,
  *    9/10/11 RLE), color-map spec, origin, dims, pixel depth, and the
  *    descriptor byte whose bits 4/5 flip the stored row/column order
  *  - pixel formats: 8-bit palette indices or grayscale, 16-bit
  *    ARGB1555, 24-bit BGR, 32-bit BGRA; palettes of 24/32-bit entries
  *  - RLE types: packets whose high bit selects run (one pixel repeated
  *    count times) vs raw (count literal pixels); runs may NOT cross the
  *    image end (over-run classifies)
  *
  * TGA carries NO magic bytes (the v2 footer is optional), so the format
  * is NOT magic-sniffed into [[ImageOps.decode]] — a crawl knows it from
  * the content type / extension, which is exactly the registry's `fmt`
  * column, and [[graft.sources.DecoderRegistry]] dispatches "tga" here
  * directly. Malformed/truncated payloads classify (null), never throw —
  * the image-family contract. Decode is exact (no quantization), so the
  * registry declares the format lossless.
  */
object Tga {

  /** Canvas bound, the family's decompression-bomb stance. */
  private val MaxPixels = 1L << 22

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  private def u16le(b: Array[Byte], i: Int): Int = Riff.u16le(b, i)

  def decode(bytes: Array[Byte]): BufferedImage =
    try {
      if (bytes == null || bytes.length < 18) return null
      val idLen = bytes(0) & 0xff
      val cmType = bytes(1) & 0xff
      val imgType = bytes(2) & 0xff
      val cmFirst = u16le(bytes, 3)
      val cmLen = u16le(bytes, 5)
      val cmBits = bytes(7) & 0xff
      val w = u16le(bytes, 12)
      val h = u16le(bytes, 14)
      val depth = bytes(16) & 0xff
      val desc = bytes(17) & 0xff
      val rightToLeft = (desc & 0x10) != 0
      val topDown = (desc & 0x20) != 0
      // reserved color-map types and legacy interleave modes classify:
      // decoding around them would read palette bytes as pixels or emit
      // scrambled rows (stb_image/ImageMagick reject them the same way)
      if (cmType > 1 || (desc & 0xc0) != 0) return null
      if (w < 1 || h < 1 || w.toLong * h > MaxPixels) return null
      val rle = imgType >= 9 && imgType <= 11
      val base = if (rle) imgType - 8 else imgType
      // 1 = palette indices, 2 = truecolor, 3 = grayscale
      if (base < 1 || base > 3) return null
      val bpp = depth match {
        case 8 if base != 2 => 1
        case 15 | 16 if base == 2 => 2 // same ARGB1555 layout either way
        case 24 if base == 2 => 3
        case 32 if base == 2 => 4
        case _ => return null
      }
      if (base == 1 && (cmType != 1 || cmLen < 1)) return null
      var p = 18 + idLen
      val palette: Array[Int] =
        if (cmType == 1) {
          val entryBytes = cmBits match {
            case 24 => 3
            case 32 => 4
            case _ => return null // 15/16-bit palettes are vanishingly rare
          }
          if (p + entryBytes.toLong * cmLen > bytes.length) return null
          val pal = Array.tabulate(cmLen) { i =>
            val e = p + entryBytes * i // BGR(A) entries
            val a = if (entryBytes == 4) bytes(e + 3) & 0xff else 0xff
            (a << 24) | ((bytes(e + 2) & 0xff) << 16) |
              ((bytes(e + 1) & 0xff) << 8) | (bytes(e) & 0xff)
          }
          p += entryBytes * cmLen
          pal
        } else Array.empty[Int]

      def pixelAt(q: Int): Int = bpp match {
        case 1 =>
          if (base == 3) { // grayscale
            val g = bytes(q) & 0xff
            0xff000000 | (g << 16) | (g << 8) | g
          } else { // palette index, biased by the map's first-entry index
            val idx = (bytes(q) & 0xff) - cmFirst
            if (idx < 0 || idx >= palette.length) fail()
            palette(idx)
          }
        case 2 => // ARGB1555 little-endian; the attribute bit's meaning
          // varies by writer (alpha vs overlay), so it decodes opaque —
          // the convention most viewers apply
          val v = u16le(bytes, q)
          val r = ((v >> 10) & 0x1f) * 255 / 31
          val g = ((v >> 5) & 0x1f) * 255 / 31
          val b = (v & 0x1f) * 255 / 31
          0xff000000 | (r << 16) | (g << 8) | b
        case 3 =>
          0xff000000 | ((bytes(q + 2) & 0xff) << 16) |
            ((bytes(q + 1) & 0xff) << 8) | (bytes(q) & 0xff)
        case _ =>
          ((bytes(q + 3) & 0xff) << 24) | ((bytes(q + 2) & 0xff) << 16) |
            ((bytes(q + 1) & 0xff) << 8) | (bytes(q) & 0xff)
      }

      // decode the pixel stream in STORAGE order, then place by origin
      val n = w * h
      val stored = new Array[Int](n)
      if (!rle) {
        if (p + bpp.toLong * n > bytes.length) return null
        var i = 0
        while (i < n) { stored(i) = pixelAt(p + bpp * i); i += 1 }
      } else {
        var i = 0
        while (i < n) {
          if (p >= bytes.length) return null
          val packet = bytes(p) & 0xff
          p += 1
          val count = (packet & 0x7f) + 1
          if (i + count > n) return null // packets may not overrun the image
          if ((packet & 0x80) != 0) { // run: one pixel repeated
            if (p + bpp > bytes.length) return null
            val v = pixelAt(p)
            p += bpp
            var j = 0
            while (j < count) { stored(i) = v; i += 1; j += 1 }
          } else { // raw: count literal pixels
            if (p + bpp.toLong * count > bytes.length) return null
            var j = 0
            while (j < count) { stored(i) = pixelAt(p + bpp * j); i += 1; j += 1 }
            p += bpp * count
          }
        }
      }
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      if (topDown && !rightToLeft) img.setRGB(0, 0, w, h, stored, 0, w)
      else { // reorder only when the descriptor actually flips an axis
        val px = new Array[Int](n)
        var y = 0
        while (y < h) {
          val srcRow = if (topDown) y else h - 1 - y
          var x = 0
          while (x < w) {
            val srcX = if (rightToLeft) w - 1 - x else x
            px(y * w + x) = stored(srcRow * w + srcX)
            x += 1
          }
          y += 1
        }
        img.setRGB(0, 0, w, h, px, 0, w)
      }
      img
    } catch {
      case _: Malformed => null
      case scala.util.control.NonFatal(_) => null
    }

  /** TGA encode (the inverse surface, fixture/test side). `imgType` is
    * the wire type (1/2/3, +8 for RLE); `depth` the pixel depth; the
    * descriptor's origin bits come from `topDown`/`rightToLeft`. Palette
    * types collect the distinct colors (≤256 required). */
  def encode(px: Array[Int], w: Int, h: Int, imgType: Int, depth: Int,
      topDown: Boolean = true, rightToLeft: Boolean = false): Array[Byte] = {
    require(w >= 1 && w <= 0xffff && h >= 1 && h <= 0xffff, s"dims ${w}x$h")
    require(px.length == w * h, "pixel count mismatch")
    val rle = imgType >= 9
    val base = if (rle) imgType - 8 else imgType
    require(base >= 1 && base <= 3, s"image type $imgType")
    val palette: Array[Int] =
      if (base == 1) {
        val colors = px.map(_ | 0xff000000).distinct.sorted
        require(colors.length <= 256, s"${colors.length} colors exceed a byte index")
        colors
      } else Array.empty[Int]
    val colorIndex = palette.zipWithIndex.toMap
    val bpp = base match {
      case 1 => require(depth == 8, "palette types are 8-bit"); 1
      case 3 => require(depth == 8, "grayscale is 8-bit here"); 1
      case _ => depth match {
        case 24 => 3
        case 32 => 4
        case _ => throw new IllegalArgumentException(s"depth $depth")
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    bos.write(0) // no id field
    bos.write(if (base == 1) 1 else 0)
    bos.write(imgType)
    w16(0); w16(palette.length); bos.write(if (base == 1) 24 else 0)
    w16(0); w16(0); w16(w); w16(h)
    bos.write(depth)
    bos.write((if (rightToLeft) 0x10 else 0) | (if (topDown) 0x20 else 0))
    palette.foreach { c => // BGR entries
      bos.write(c & 0xff); bos.write((c >>> 8) & 0xff); bos.write((c >>> 16) & 0xff)
    }
    // pixels in STORAGE order per the descriptor bits
    def emit(v: Int): Unit = base match {
      case 1 => bos.write(colorIndex(v | 0xff000000))
      case 3 => bos.write(v & 0xff) // gray channel
      case _ =>
        bos.write(v & 0xff); bos.write((v >>> 8) & 0xff); bos.write((v >>> 16) & 0xff)
        if (bpp == 4) bos.write((v >>> 24) & 0xff)
    }
    val stored = new Array[Int](w * h)
    (0 until h).foreach { sy =>
      val y = if (topDown) sy else h - 1 - sy
      (0 until w).foreach { sx =>
        val x = if (rightToLeft) w - 1 - sx else sx
        stored(sy * w + sx) = px(y * w + x)
      }
    }
    if (!rle) stored.foreach(emit)
    else {
      // greedy per SCAN LINE: the spec forbids packets that cross line
      // boundaries, so runs/raws restart at each row (the decoder here is
      // tolerant, but files must be valid to conforming third parties)
      (0 until h).foreach { row =>
        var i = row * w
        val rowEnd = i + w
        while (i < rowEnd) {
          var run = 1
          while (run < 128 && i + run < rowEnd && stored(i + run) == stored(i)) run += 1
          if (run >= 2) {
            bos.write(0x80 | (run - 1)); emit(stored(i)); i += run
          } else {
            var raw = 1
            while (raw < 128 && i + raw < rowEnd &&
              !(i + raw + 1 < rowEnd && stored(i + raw) == stored(i + raw + 1))) raw += 1
            bos.write(raw - 1)
            (0 until raw).foreach(j => emit(stored(i + j)))
            i += raw
          }
        }
      }
    }
    bos.toByteArray
  }
}
