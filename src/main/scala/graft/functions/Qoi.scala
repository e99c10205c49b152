package graft.functions

import java.awt.image.BufferedImage

/** Real decode for the QOI image format ("Quite OK Image", Szablewski
  * 2022 — a published one-page spec at qoiformat.org): an LZ-style
  * byte-oriented codec the JDK's ImageIO has NO reader for, so the module
  * owns the whole layer. Six op families share the stream — a 64-slot
  * running color INDEX keyed by `(3r+5g+7b+11a) % 64`, two-bit channel
  * DIFFs, the green-anchored LUMA delta, RUN lengths 1..62, and raw
  * RGB/RGBA literals — over a 14-byte big-endian header and an 8-byte end
  * marker. [[ImageOps.decode]] sniffs the `qoif` magic and routes here,
  * so the entire image pipeline (phash, PSNR validation, resize, the
  * fetch+verify J7 gate) handles QOI payloads like any PNG/JPEG.
  *
  * The reference's converter registry (`src/converters/base.py:10-27`)
  * dispatches payload decoders by format; this slots in beside the JDK
  * codecs the same way.
  *
  * Contract matches [[ImageOps.decode]]/[[Wav]]: malformed, truncated or
  * hostile payloads return null — never a throw. Decode output is bounded
  * by the claimed geometry, which is capped ([[MaxPixels]]) because a
  * RUN-heavy few-hundred-byte payload can claim any width×height
  * (decompression bomb — same discipline as [[Gif]]/[[Avi]]).
  */
object Qoi {

  /** Canvas bound: 4 bytes/pixel, so 2^22 pixels caps decode at 16 MiB. */
  private val MaxPixels = 1L << 22

  def isQoi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 14 &&
      bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' && bytes(3) == 'f'

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) & 63 // %64: the spec's index key

  /** Decode to a BufferedImage (INT_RGB for 3-channel, INT_ARGB for 4);
    * null for anything malformed: bad magic/geometry/channels, a chunk
    * stream that exhausts before the last pixel, or a missing end marker
    * (which is how truncation shows up). A RUN that overshoots the pixel
    * count is tolerated like the reference decoder (the surplus is simply
    * never consumed). */
  def decode(bytes: Array[Byte]): BufferedImage = {
    if (!isQoi(bytes)) return null
    val w = u32be(bytes, 4); val h = u32be(bytes, 8)
    val channels = bytes(12) & 0xff; val colorspace = bytes(13) & 0xff
    if (w <= 0 || h <= 0 || w * h > MaxPixels) return null
    if ((channels != 3 && channels != 4) || colorspace > 1) return null
    val n = (w * h).toInt
    val px = new Array[Int](n)
    val index = new Array[Int](64) // zero-initialized = (0,0,0,0), per spec
    var r = 0; var g = 0; var b = 0; var a = 255
    var p = 14
    val end = bytes.length - 8 // the marker is not chunk data
    var i = 0
    var run = 0
    while (i < n) {
      if (run > 0) run -= 1
      else if (p < end) {
        val b1 = bytes(p) & 0xff; p += 1
        if (b1 == 0xfe) { // QOI_OP_RGB
          if (p + 3 > end) return null
          r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff; b = bytes(p + 2) & 0xff
          p += 3
        } else if (b1 == 0xff) { // QOI_OP_RGBA
          if (p + 4 > end) return null
          r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff; b = bytes(p + 2) & 0xff
          a = bytes(p + 3) & 0xff
          p += 4
        } else (b1 >> 6) match {
          case 0 => // QOI_OP_INDEX
            val v = index(b1 & 63)
            r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff
            b = (v >>> 8) & 0xff; a = v & 0xff
          case 1 => // QOI_OP_DIFF: 2-bit channel deltas, bias 2, wrapping
            r = (r + ((b1 >> 4) & 3) - 2) & 0xff
            g = (g + ((b1 >> 2) & 3) - 2) & 0xff
            b = (b + (b1 & 3) - 2) & 0xff
          case 2 => // QOI_OP_LUMA: green delta ±32, red/blue anchored to it
            if (p + 1 > end) return null
            val b2 = bytes(p) & 0xff; p += 1
            val dg = (b1 & 63) - 32
            r = (r + dg + ((b2 >> 4) & 15) - 8) & 0xff
            g = (g + dg) & 0xff
            b = (b + dg + (b2 & 15) - 8) & 0xff
          case _ => // QOI_OP_RUN: lengths 1..62 (63/64 are the RGB(A) tags)
            run = b1 & 63 // this pixel + `run` more
        }
        index(hash(r, g, b, a)) = (r << 24) | (g << 16) | (b << 8) | a
      } else return null // stream exhausted with pixels left
      px(i) = (a << 24) | (r << 16) | (g << 8) | b
      i += 1
    }
    // end marker: seven 0x00 then 0x01 — a truncated-but-parseable prefix
    // must CLASSIFY as malformed, not pass as a complete image
    if (p + 8 > bytes.length) return null
    var j = 0
    while (j < 7) { if (bytes(p + j) != 0) return null; j += 1 }
    if (bytes(p + 7) != 1) return null
    val img = new BufferedImage(w.toInt, h.toInt,
      if (channels == 4) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w.toInt, h.toInt, px, 0, w.toInt)
    img
  }

  /** Chunk-tag census of a QOI stream (spec surface: proves which op
    * families a payload actually carries). Walks tags only — sizes are
    * fixed per family — and stops at the end marker region. */
  private[graft] def opHistogram(bytes: Array[Byte]): Map[String, Int] = {
    if (!isQoi(bytes)) return Map.empty
    var p = 14
    val end = bytes.length - 8
    var rgb = 0; var rgba = 0; var idx = 0; var diff = 0; var luma = 0; var run = 0
    while (p < end) {
      val b1 = bytes(p) & 0xff
      if (b1 == 0xfe) { rgb += 1; p += 4 }
      else if (b1 == 0xff) { rgba += 1; p += 5 }
      else { (b1 >> 6) match {
        case 0 => idx += 1
        case 1 => diff += 1
        case 2 => luma += 1; p += 1
        case _ => run += 1
      }; p += 1 }
    }
    Map("rgb" -> rgb, "rgba" -> rgba, "index" -> idx, "diff" -> diff,
      "luma" -> luma, "run" -> run)
  }

  /** Encode ARGB pixels (row-major) with the reference encoder's greedy op
    * choice: RUN while the pixel repeats, then INDEX on a hash hit, then
    * DIFF, then LUMA, then a raw literal; alpha changes force RGBA.
    * `channels` is the header's 3/4 declaration (with 3, alpha bytes are
    * ignored and assumed 255, like a 3-channel reference encode). */
  def encode(px: Array[Int], w: Int, h: Int, channels: Int = 3): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels must be 3 or 4, got $channels")
    require(w > 0 && h > 0 && px.length == w * h, "pixels must match geometry")
    val out = new java.io.ByteArrayOutputStream(14 + px.length + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be(v: Int): Unit = { out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    be(w); be(h); out.write(channels); out.write(0) // colorspace 0: sRGB
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    var i = 0
    while (i < px.length) {
      val v = px(i)
      val r = (v >>> 16) & 0xff; val g = (v >>> 8) & 0xff; val b = v & 0xff
      val a = if (channels == 4) (v >>> 24) & 0xff else 255
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62 || i == px.length - 1) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val hx = hash(r, g, b, a)
        val packed = (r << 24) | (g << 16) | (b << 8) | a
        if (index(hx) == packed) out.write(hx) // QOI_OP_INDEX
        else {
          index(hx) = packed
          if (a == pa) {
            // wrapping int8 deltas, exactly the reference's signed-char math
            val dr = ((r - pr) << 24) >> 24
            val dg = ((g - pg) << 24) >> 24
            val db = ((b - pb) << 24) >> 24
            val drg = dr - dg; val dbg = db - dg
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                dbg >= -8 && dbg <= 7) {
              out.write(0x80 | (dg + 32)); out.write(((drg + 8) << 4) | (dbg + 8))
            } else { out.write(0xfe); out.write(r); out.write(g); out.write(b) }
          } else {
            out.write(0xff); out.write(r); out.write(g); out.write(b); out.write(a)
          }
        }
      }
      pr = r; pg = g; pb = b; pa = a
      i += 1
    }
    (0 until 7).foreach(_ => out.write(0))
    out.write(1)
    out.toByteArray
  }
}
