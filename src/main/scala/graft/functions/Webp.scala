package graft.functions

import java.awt.image.BufferedImage

/** Real decode for WebP LOSSLESS (VP8L) — the modern image format the
  * JDK's ImageIO has NO reader for, and the deepest entropy-coded image
  * bitstream in the module: canonical prefix (huffman) codes transmitted
  * via DEFLATE-style code-length codes (with the VP8L-specific
  * `17,18,0..5,16,6..15` transmission order and 16/17/18 repeat ops),
  * LZ77 backward references whose short distances ride a 120-entry 2-D
  * neighbor map, a multiplicative-hash color cache, meta-prefix (entropy
  * image) group routing, and four spatial transforms — per-block
  * 14-mode pixel prediction, the signed-8-bit cross-color transform,
  * subtract-green, and color indexing with sub-byte pixel bundling —
  * applied inverse in reverse bitstream order. Spec: RFC 9649 (the WebP
  * format, lossless bitstream section); no code is taken from libwebp.
  *
  * The reference's converter registry (`src/converters/base.py:10-27`)
  * dispatches payload decoders by format; this slots in beside the JDK
  * codecs exactly like [[Qoi]]: [[ImageOps.decode]] sniffs the
  * RIFF/WEBP/VP8L magic and routes here, so phash, PSNR validation,
  * resize and the J7 fetch+verify gate all handle WebP-lossless payloads
  * like any PNG.
  *
  * Contract matches [[ImageOps.decode]]/[[Qoi]]/[[Wav]]: malformed,
  * truncated or hostile payloads return null — never a throw. A VP8L
  * header can claim 16383×16383 from a few dozen bytes (and a single
  * backward reference expands to 4096 pixels), so decode output is NOT
  * input-proportional even for well-formed streams: the claimed canvas is
  * capped ([[MaxPixels]]) before any allocation, the same
  * decompression-bomb discipline as [[Gif]]/[[Apng]]/[[Flac]]. Lossy
  * WebP (`VP8 `/`VP8X` chunks) needs the full VP8 intra predictor + DCT
  * stack and stays with the other modern-codec stubs — this decoder
  * classifies it as undecodable (null) rather than pretending.
  */
object Webp {

  /** Canvas bound: 4 bytes/pixel, so 2^22 pixels caps decode at 16 MiB. */
  private val MaxPixels = 1L << 22

  /** Decode failure — internal only; every public entry maps it to null. */
  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** Wire-level counters for [[opHistogram]] — which bitstream features a
    * payload actually used (specs assert every family is on the wire for
    * the fixture corpus, the [[Qoi.opHistogram]] discipline). */
  private final class Acc {
    var literal = 0 // plain ARGB pixels
    var copy = 0 // LZ77 backward references, direct distance form
    var mapCopy = 0 // LZ77 via the 120-entry 2-D neighbor map
    var cacheHit = 0 // color-cache symbols
    var transforms = Set.empty[Int] // 0 pred / 1 color / 2 sub-green / 3 index
  }

  // ---------------------------------------------------------------------
  // Container
  // ---------------------------------------------------------------------

  /** RIFF/WEBP sniff (any flavor — lossy included, so the registry can
    * classify rather than fall through to ImageIO's "no reader"). */
  def isWebp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 16 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'

  private def u32le(b: Array[Byte], i: Int): Long = Riff.u32le(b, i)

  /** Walk the RIFF chunks and return the [start, end) of the VP8L payload,
    * or null when the container carries no lossless bitstream. Package
    * access: [[AnimWebp]] extracts per-frame VP8L chunks through this. */
  private[functions] def vp8lRange(b: Array[Byte]): (Int, Int) = {
    var p = 12
    while (p + 8 <= b.length) {
      val size = u32le(b, p + 4)
      if (size < 0 || size > b.length - p - 8) return null
      if (b(p) == 'V' && b(p + 1) == 'P' && b(p + 2) == '8' && b(p + 3) == 'L')
        return (p + 8, p + 8 + size.toInt)
      p += 8 + size.toInt + (size.toInt & 1) // chunks are 2-byte aligned
    }
    null
  }

  // ---------------------------------------------------------------------
  // Bit reader — VP8L packs bits LSB-first within bytes; prefix-code bits
  // are consumed MSB-of-the-code-first (DEFLATE's convention).
  // ---------------------------------------------------------------------

  private final class BitReader(data: Array[Byte], start: Int, val end: Int) {
    private var pos = start
    private var bitPos = 0

    def bit(): Int = {
      if (pos >= end) fail() // truncation classifies, never wraps
      val v = (data(pos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      v
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  // ---------------------------------------------------------------------
  // Canonical prefix codes
  // ---------------------------------------------------------------------

  private val MaxCodeLength = 15

  /** A canonical prefix code over `lengths` (0 = absent). Exactly one of:
    * a 0-bit single-symbol code (the simple-code form, or a normal
    * transmission whose lengths use exactly one symbol — libwebp's
    * BuildHuffmanTable "code with only one value" special case, which
    * real encoders emit via ClearHuffmanTreeIfOnlyOneSymbol), or a
    * COMPLETE canonical code — anything else under- or over-subscribed
    * is malformed, per the spec. Decoding walks length by length with
    * the canonical first-code recurrence (no tree allocation). */
  private sealed class Prefix(lengths: Array[Int], zeroBitSymbol: Int) {
    // count(l) and the symbols sorted by (length, symbol)
    private val count = new Array[Int](MaxCodeLength + 1)
    private var single = zeroBitSymbol // 0-bit symbol, -1 if a real code
    private val sorted: Array[Int] = if (zeroBitSymbol >= 0) null else {
      var n = 0
      var s = 0
      var last = -1
      while (s < lengths.length) {
        val l = lengths(s)
        if (l < 0 || l > MaxCodeLength) fail()
        if (l > 0) { count(l) += 1; n += 1; last = s }
        s += 1
      }
      if (n == 0) fail()
      if (n == 1) { single = last; null }
      else {
        // Kraft must close exactly: `left` is the number of unassigned
        // code slots at each depth; negative = over-subscribed, nonzero
        // at the end = incomplete — rejected for hostile streams.
        var left = 2
        var l = 1
        while (l <= MaxCodeLength) {
          left -= count(l)
          if (left < 0) fail()
          left <<= 1
          l += 1
        }
        if (left != 0) fail()
        val out = new Array[Int](n)
        val offsets = new Array[Int](MaxCodeLength + 1)
        var acc = 0
        l = 1
        while (l <= MaxCodeLength) { offsets(l) = acc; acc += count(l); l += 1 }
        s = 0
        while (s < lengths.length) {
          if (lengths(s) > 0) { out(offsets(lengths(s))) = s; offsets(lengths(s)) += 1 }
          s += 1
        }
        out
      }
    }

    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var len = 0
      var code = 0
      var first = 0
      var index = 0
      while (len < MaxCodeLength) {
        len += 1
        code = (code << 1) | br.bit()
        val c = count(len)
        if (code - first < c) return sorted(index + code - first)
        index += c
        first = (first + c) << 1
      }
      fail()
    }
  }

  private def prefixOf(lengths: Array[Int]): Prefix = new Prefix(lengths, -1)

  /** Simple-code 2-symbol form: one bit selects, in transmission order. */
  private final class SimplePair(sym0: Int, sym1: Int) extends Prefix(null, sym0) {
    override def read(br: BitReader): Int = if (br.bit() == 0) sym0 else sym1
  }

  /** Code-length-code transmission order (RFC 9649; differs from DEFLATE). */
  private val ClOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code for an `alphabet`-symbol space: either the
    * simple 1-2 symbol form or normal code-length-coded lengths. */
  private def readPrefixCode(br: BitReader, alphabet: Int): Prefix = {
    if (br.bit() == 1) { // simple
      val numSyms = br.bit() + 1
      val sym0 = if (br.bit() == 1) br.bits(8) else br.bit()
      if (sym0 >= alphabet) fail()
      if (numSyms == 1) return new Prefix(null, sym0)
      val sym1 = br.bits(8)
      if (sym1 >= alphabet || sym1 == sym0) fail()
      // simple 2-symbol codes bind code 0/1 in READ order, not canonical
      // symbol order (a stream may list the larger symbol first)
      new SimplePair(sym0, sym1)
    } else {
      val numCl = 4 + br.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val clCode = prefixOf(clLens)
      var maxSymbol =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          val m = 2 + br.bits(nbits)
          if (m > alphabet) fail()
          m
        } else alphabet
      val lens = new Array[Int](alphabet)
      var sym = 0
      var prev = 8 // default repeat value before any nonzero length
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lens(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (rep, fill) = cl match {
            case 16 => (3 + br.bits(2), prev)
            case 17 => (3 + br.bits(3), 0)
            case _  => (11 + br.bits(7), 0)
          }
          if (sym + rep > alphabet) fail()
          var j = 0
          while (j < rep) { lens(sym) = fill; sym += 1; j += 1 }
        }
      }
      prefixOf(lens)
    }
  }

  /** Test hook: read one prefix code from raw LSB-first bits, then decode
    * `reads` symbols — exercises the normal-form grammar (including the
    * single-symbol 0-bit special case) without hand-building a whole VP8L
    * container. Returns null where a decoder would classify malformed. */
  private[graft] def readPrefixCodeForTest(bytes: Array[Byte], alphabet: Int, reads: Int): Seq[Int] =
    try {
      val br = new BitReader(bytes, 0, bytes.length)
      val p = readPrefixCode(br, alphabet)
      (0 until reads).map(_ => p.read(br))
    } catch { case _: Malformed => null }

  // ---------------------------------------------------------------------
  // LZ77 plumbing shared by decode and encode
  // ---------------------------------------------------------------------

  /** Prefix-coded value (lengths and distance codes): 4 direct codes then
    * (2 + parity) << extra_bits ranges. */
  private def prefixValue(code: Int, br: BitReader): Int = {
    if (code < 0) fail()
    if (code < 4) return code + 1
    val extraBits = (code - 2) >> 1
    val offset = (2 + (code & 1)) << extraBits
    offset + br.bits(extraBits) + 1
  }

  /** The 120-entry short-distance neighbor map: all (dx, dy) with
    * dy in 0..7, dx in -7..8 strictly "before" the current pixel, sorted
    * by squared Euclidean distance, ties by larger dy then larger dx —
    * the closed form behind the table RFC 9649 lists literally (the spec
    * file asserts this derivation against the RFC's full 120-row table).
    * dx cannot reach -8: libwebp packs dx as the nibble 8-dx, so the
    * candidate grid is exactly 120 pairs with nothing to truncate.
    * Packed as (dy << 8) | (dx + 8). */
  private[graft] val DistMap: Array[Int] = {
    val cand = for {
      y <- 0 to 7
      x <- -7 to 8
      if y > 0 || x > 0
    } yield (x, y)
    val sorted = cand.sortBy { case (x, y) => (x * x + y * y, -y, -x) }
    require(sorted.length == 120)
    sorted.map { case (x, y) => (y << 8) | (x + 8) }.toArray
  }

  /** distance_code → pixel distance given the coded row width. */
  private def mapDistance(distCode: Int, xsize: Int): Int = {
    if (distCode > 120) distCode - 120
    else {
      val packed = DistMap(distCode - 1)
      val dx = (packed & 0xff) - 8
      val dy = packed >> 8
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }
  }

  /** Color-cache slot of a pixel (multiplicative hash, top bits). */
  private def cacheKey(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  /** Inverse of [[mapDistance]]: the distance CODE for a pixel distance at
    * a given coded width — the first neighbor-map slot that maps to it, or
    * the direct form. Encoder-side only, but kept beside the forward map
    * so the two stay one table. */
  private def encodeDistance(dist: Int, xsize: Int): Int = {
    if (dist == 1) return 121 // direct form — keeps both decoder branches live
    var i = 0
    while (i < 120) {
      if (mapDistance(i + 1, xsize) == dist) return i + 1
      i += 1
    }
    dist + 120
  }

  // ---------------------------------------------------------------------
  // Entropy-coded / spatially-coded image decode
  // ---------------------------------------------------------------------

  /** Decode one ARGB image of w×h coded pixels. `spatial` images may carry
    * a meta-prefix (entropy image routing pixels to prefix-code groups);
    * auxiliary images (transforms, palette, the entropy image itself) may
    * not, but read their own color-cache bit — both per the spec grammar.
    */
  private def decodeImage(br: BitReader, w: Int, h: Int, spatial: Boolean,
      acc: Acc = null): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) fail()
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    if (cacheBits < 0 || cacheBits > 11) fail()
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (spatial && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaW = subSize(w, metaBits)
      meta = decodeImage(br, metaW, subSize(h, metaBits), spatial = false)
      var m = 0
      var i = 0
      while (i < meta.length) {
        val g = (meta(i) >> 8) & 0xffff
        if (g > m) m = g
        i += 1
      }
      numGroups = m + 1
      if (numGroups > 1 + meta.length) fail() // groups beyond any routable index
    }

    val greenAlphabet = 256 + 24 + cacheSize
    val groups = new Array[Array[Prefix]](numGroups)
    var gi = 0
    while (gi < numGroups) {
      groups(gi) = Array(
        readPrefixCode(br, greenAlphabet),
        readPrefixCode(br, 256), // red
        readPrefixCode(br, 256), // blue
        readPrefixCode(br, 256), // alpha
        readPrefixCode(br, 40)) // distance
      gi += 1
    }

    val n = w * h
    val out = new Array[Int](n)
    var pos = 0
    var x = 0
    var y = 0

    def push(argb: Int): Unit = {
      out(pos) = argb
      if (cache != null) cache(cacheKey(argb, cacheBits)) = argb
      pos += 1
      x += 1
      if (x == w) { x = 0; y += 1 }
    }

    while (pos < n) {
      val grp =
        if (meta == null) groups(0)
        else {
          val idx = (meta((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xffff
          if (idx >= numGroups) fail()
          groups(idx)
        }
      val sym = grp(0).read(br)
      if (sym < 256) {
        val red = grp(1).read(br)
        val blue = grp(2).read(br)
        val alpha = grp(3).read(br)
        if (acc != null) acc.literal += 1
        push((alpha << 24) | (red << 16) | (sym << 8) | blue)
      } else if (sym < 280) {
        val len = prefixValue(sym - 256, br)
        val distCode = prefixValue(grp(4).read(br), br)
        val dist = mapDistance(distCode, w)
        if (dist > pos || pos + len > n) fail()
        if (acc != null) { if (distCode <= 120) acc.mapCopy += 1 else acc.copy += 1 }
        var j = 0
        while (j < len) { push(out(pos - dist)); j += 1 }
      } else {
        val idx = sym - 280
        if (cache == null || idx >= cacheSize) fail()
        if (acc != null) acc.cacheHit += 1
        push(cache(idx))
      }
    }
    out
  }

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  // ---------------------------------------------------------------------
  // Inverse transforms
  // ---------------------------------------------------------------------

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a+b)/2 without unpacking: mask out the carry bits
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(a: Int, b: Int): Int = {
    val ag = (a >>> 8) & 0x00ff00ff
    val bg = (b >>> 8) & 0x00ff00ff
    val hi = (ag + bg) & 0x00ff00ff
    val lo = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    (hi << 8) | lo
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    var pL = 0
    var pT = 0
    var sh = 0
    while (sh < 32) {
      val cl = (l >>> sh) & 0xff
      val ct = (t >>> sh) & 0xff
      val ctl = (tl >>> sh) & 0xff
      val p = cl + ct - ctl
      pL += math.abs(p - cl)
      pT += math.abs(p - ct)
      sh += 8
    }
    if (pL < pT) l else t
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      out |= v << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      val v = clamp255(a + (a - b) / 2) // C-truncating division, per spec
      out |= v << sh
      sh += 8
    }
    out
  }

  /** The 14 predictors. TR for the last column indexes the NEXT array
    * slot after T — the first (already reconstructed) pixel of the
    * current row, the spec's contiguous-buffer wraparound. */
  private def predict(mode: Int, px: Array[Int], i: Int, w: Int): Int = {
    val l = px(i - 1)
    val t = px(i - w)
    mode match {
      case 0  => 0xff000000
      case 1  => l
      case 2  => t
      case 3  => px(i - w + 1)
      case 4  => px(i - w - 1)
      case 5  => avg2(avg2(l, px(i - w + 1)), t)
      case 6  => avg2(l, px(i - w - 1))
      case 7  => avg2(l, t)
      case 8  => avg2(px(i - w - 1), t)
      case 9  => avg2(t, px(i - w + 1))
      case 10 => avg2(avg2(l, px(i - w - 1)), avg2(t, px(i - w + 1)))
      case 11 => select(l, t, px(i - w - 1))
      case 12 => clampAddSubtractFull(l, t, px(i - w - 1))
      case 13 => clampAddSubtractHalf(l, t, px(i - w - 1))
      case _  => fail()
    }
  }

  /** Inverse predictor transform, in place, raster order — each pixel's
    * neighbors are already reconstructed when its residual is lifted. */
  private def inversePredictor(px: Array[Int], w: Int, h: Int, bits: Int,
      sub: Array[Int], subW: Int): Unit = {
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1) // top row: forced L
          else if (x == 0) px(i - w) // left column: forced T
          else {
            val mode = (sub((y >> bits) * subW + (x >> bits)) >> 8) & 0xff
            if (mode > 13) fail()
            predict(mode, px, i, w)
          }
        px(i) = addPixels(px(i), pred)
        i += 1
        x += 1
      }
      y += 1
    }
  }

  /** (int8 t * int8 c) >> 5 — both operands signed 8-bit, per spec. */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  /** Inverse cross-color transform: red lifts by green's delta; blue by
    * green's AND the reconstructed red's. Element packing: blue channel =
    * green_to_red, green = green_to_blue, red = red_to_blue. */
  private def inverseColor(px: Array[Int], w: Int, h: Int, bits: Int,
      sub: Array[Int], subW: Int): Unit = {
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = sub((y >> bits) * subW + (x >> bits))
        val g2r = (cte >> 0) & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val v = px(i)
        val g = (v >>> 8) & 0xff
        val r = (((v >>> 16) & 0xff) + ctDelta(g2r, g)) & 0xff
        val b = ((v & 0xff) + ctDelta(g2b, g) + ctDelta(r2b, r)) & 0xff
        px(i) = (v & 0xff00ff00) | (r << 16) | b
        i += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val v = px(i)
      val g = (v >>> 8) & 0xff
      val r = (((v >>> 16) & 0xff) + g) & 0xff
      val b = ((v & 0xff) + g) & 0xff
      px(i) = (v & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Indices-per-green-byte packing width for a palette size. */
  private def bundleBits(paletteSize: Int): Int =
    if (paletteSize <= 2) 3 else if (paletteSize <= 4) 2
    else if (paletteSize <= 16) 1 else 0

  /** Inverse color-indexing: unbundle sub-byte indices from the green
    * channel and look up the palette; out-of-range indices map to
    * transparent black (padding slots in the last bundle land here). */
  private def inverseColorIndex(coded: Array[Int], codedW: Int, w: Int, h: Int,
      widthBits: Int, palette: Array[Int]): Array[Int] = {
    val out = new Array[Int](w * h)
    val bpp = 8 >> widthBits
    val mask = (1 << bpp) - 1
    val per = (1 << widthBits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packed = (coded(y * codedW + (x >> widthBits)) >>> 8) & 0xff
        val idx = (packed >> ((x & per) * bpp)) & mask
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // Top-level decode
  // ---------------------------------------------------------------------

  private sealed trait Transform
  private final case class Pred(bits: Int, sub: Array[Int], subW: Int) extends Transform
  private final case class Color(bits: Int, sub: Array[Int], subW: Int) extends Transform
  private case object SubGreen extends Transform
  private final case class Indexing(widthBits: Int, palette: Array[Int]) extends Transform

  /** Decode to TYPE_INT_ARGB; null for anything that is not a well-formed
    * VP8L stream within the canvas cap — including lossy WebP. */
  def decode(bytes: Array[Byte]): BufferedImage = decodeImpl(bytes, null)

  /** Wire-feature histogram of a payload (decodes it fully): literal /
    * copy / map_copy / cache token counts plus a 0-or-1 marker per
    * transform family. Empty for undecodable payloads. */
  def opHistogram(bytes: Array[Byte]): Map[String, Int] = {
    val acc = new Acc
    if (decodeImpl(bytes, acc) == null) Map.empty
    else Map(
      "literal" -> acc.literal, "copy" -> acc.copy, "map_copy" -> acc.mapCopy,
      "cache" -> acc.cacheHit,
      "t_pred" -> (if (acc.transforms(0)) 1 else 0),
      "t_color" -> (if (acc.transforms(1)) 1 else 0),
      "t_subgreen" -> (if (acc.transforms(2)) 1 else 0),
      "t_index" -> (if (acc.transforms(3)) 1 else 0))
  }

  private def decodeImpl(bytes: Array[Byte], acc: Acc): BufferedImage = {
    if (!isWebp(bytes)) return null
    try {
      val range = vp8lRange(bytes)
      if (range == null) return null
      val br = new BitReader(bytes, range._1, range._2)
      if (br.bits(8) != 0x2f) return null
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bit() // alpha-is-used hint
      if (br.bits(3) != 0) return null // version must be 0
      if (w.toLong * h > MaxPixels) return null

      var xsize = w
      var transforms = List.empty[Transform]
      var seen = Set.empty[Int]
      while (br.bit() == 1) {
        val t = br.bits(2)
        if (seen(t)) fail() // each transform type at most once
        seen += t
        if (acc != null) acc.transforms += t
        t match {
          case 0 | 1 =>
            val bits = br.bits(3) + 2
            val subW = subSize(xsize, bits)
            val sub = decodeImage(br, subW, subSize(h, bits), spatial = false)
            transforms ::= (if (t == 0) Pred(bits, sub, subW) else Color(bits, sub, subW))
          case 2 =>
            transforms ::= SubGreen
          case _ =>
            val paletteSize = br.bits(8) + 1
            val raw = decodeImage(br, paletteSize, 1, spatial = false)
            // palette entries are per-channel deltas off the previous entry
            var i = 1
            while (i < raw.length) { raw(i) = addPixels(raw(i), raw(i - 1)); i += 1 }
            val wb = bundleBits(paletteSize)
            transforms ::= Indexing(wb, raw)
            xsize = subSize(xsize, wb)
        }
      }

      var px = decodeImage(br, xsize, h, spatial = true, acc)
      var curW = xsize
      // transforms list is already most-recently-read first: inverse order
      transforms.foreach {
        case Pred(bits, sub, subW)  => inversePredictor(px, curW, h, bits, sub, subW)
        case Color(bits, sub, subW) => inverseColor(px, curW, h, bits, sub, subW)
        case SubGreen               => inverseSubtractGreen(px)
        case Indexing(wb, palette) =>
          px = inverseColorIndex(px, curW, w, h, wb, palette)
          curW = w
      }
      if (curW != w) fail() // an indexing transform must restore full width

      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      img
    } catch {
      case _: Malformed => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  // ---------------------------------------------------------------------
  // Encoder — fixture/test side. Deterministic throughout (huffman ties
  // break on symbol order) so the same pixels always produce the same
  // bytes; the decoder above never assumes anything this encoder does.
  // ---------------------------------------------------------------------

  /** Which forward transforms and entropy features an encode uses. The
    * palette path excludes the arithmetic transforms (the fixture never
    * needs both and the spec drives each combination separately). */
  final case class WebpOptions(
      subtractGreen: Boolean = false,
      predictorMode: Int = -1, // -1 off; 0..13 one global mode
      predictorBits: Int = 4,
      colorTransform: Boolean = false,
      colorBits: Int = 4,
      greenToRed: Int = 0, greenToBlue: Int = 0, redToBlue: Int = 0,
      palette: Boolean = false,
      cacheBits: Int = 0,
      lz77: Boolean = true)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bit(v: Int): Unit = {
      cur |= (v & 1) << n
      n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Int, count: Int): Unit = {
      var i = 0
      while (i < count) { bit(v >> i); i += 1 }
    }
    /** Prefix-code bits go out MSB-of-code first. */
    def code(c: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { bit(c >> k); k -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  /** Huffman code lengths from symbol counts, deterministic (ties break on
    * lowest contained symbol), depth-limited by iterative count halving. */
  private def huffmanLengths(counts: Array[Int], maxDepth: Int): Array[Int] = {
    val lens = new Array[Int](counts.length)
    val used = counts.indices.filter(counts(_) > 0)
    if (used.isEmpty) return lens
    if (used.size == 1) { lens(used.head) = 1; return lens }
    var weights = used.map(s => counts(s).toLong).toArray
    var done = false
    while (!done) {
      java.util.Arrays.fill(lens, 0)
      // merge queue of (weight, tiebreak, member-symbol-indices)
      var nodes = weights.zipWithIndex
        .map { case (w, k) => (w, used(k).toLong, List(k)) }
        .sortBy(t => (t._1, t._2)).toList
      while (nodes.size > 1) {
        val a :: b :: rest = nodes: @unchecked
        (a._3 ++ b._3).foreach(k => lens(used(k)) += 1)
        val merged = (a._1 + b._1, math.min(a._2, b._2), a._3 ++ b._3)
        // insert keeping (weight, tiebreak) order — stable and deterministic
        val (lo, hi) = rest.partition(t =>
          t._1 < merged._1 || (t._1 == merged._1 && t._2 <= merged._2))
        nodes = lo ::: merged :: hi
      }
      if (used.forall(lens(_) <= maxDepth)) done = true
      else weights = weights.map(w => (w + 1) >> 1)
    }
    lens
  }

  /** DEFLATE-style canonical code values for a length assignment. */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lens.length)
    var maxLen = 0
    lens.foreach(l => if (l > maxLen) maxLen = l)
    if (maxLen == 0) return codes
    val count = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var c = 0
    var l = 1
    while (l <= maxLen) { c = (c + (if (l > 1) count(l - 1) else 0)) << 1; next(l) = c; l += 1 }
    var s = 0
    while (s < lens.length) {
      if (lens(s) > 0) { codes(s) = next(lens(s)); next(lens(s)) += 1 }
      s += 1
    }
    codes
  }

  /** One transmitted prefix code: header writer + per-symbol emitter. */
  private final class BuiltCode(counts: Array[Int], maxDepth: Int) {
    // simpleSyms: transmitted via the simple form (1 symbol = 0 bits each,
    // 2 symbols = 1 bit each in listed order); otherwise normal lens.
    private val used = counts.indices.filter(counts(_) > 0)
    private val simpleSyms: Array[Int] =
      if (used.isEmpty) Array(0)
      else if (used.size == 1 && used.head <= 255) Array(used.head)
      else if (used.size == 2 && used(1) <= 255) Array(used(0), used(1))
      else null
    private val lens: Array[Int] =
      if (simpleSyms != null) null
      else {
        val l = huffmanLengths(counts, maxDepth)
        if (used.size == 1) l(if (used.head == 0) 1 else 0) = 1 // complete the pair
        l
      }
    private val codes: Array[Int] = if (lens == null) null else canonicalCodes(lens)

    def writeHeader(bw: BitWriter): Unit = {
      if (simpleSyms != null) {
        bw.bit(1) // simple
        bw.bit(simpleSyms.length - 1)
        if (simpleSyms(0) <= 1) { bw.bit(0); bw.bit(simpleSyms(0)) }
        else { bw.bit(1); bw.bits(simpleSyms(0), 8) }
        if (simpleSyms.length == 2) bw.bits(simpleSyms(1), 8)
        return
      }
      bw.bit(0) // normal: code-length-coded lengths
      // RLE the length sequence: literals 0..15 plus 17/18 zero runs
      val items = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var i = 0
      while (i < lens.length) {
        if (lens(i) == 0) {
          var run = 0
          while (i + run < lens.length && lens(i + run) == 0) run += 1
          i += run
          while (run >= 3) {
            if (run >= 11) { val r = math.min(run, 138); items += ((18, 7, r - 11)); run -= r }
            else { items += ((17, 3, run - 3)); run = 0 }
          }
          var j = 0
          while (j < run) { items += ((0, 0, 0)); j += 1 }
        } else { items += ((lens(i), 0, 0)); i += 1 }
      }
      val clCounts = new Array[Int](19)
      items.foreach(t => clCounts(t._1) += 1)
      val clLens = huffmanLengths(clCounts, 7)
      if (clCounts.count(_ > 0) == 1) { // a 1-symbol cl code is incomplete
        val only = clCounts.indexWhere(_ > 0)
        clLens(if (only == 0) 1 else 0) = 1
      }
      val clCodes = canonicalCodes(clLens)
      var numCl = 19
      while (numCl > 4 && clLens(ClOrder(numCl - 1)) == 0) numCl -= 1
      bw.bits(numCl - 4, 4)
      var k = 0
      while (k < numCl) { bw.bits(clLens(ClOrder(k)), 3); k += 1 }
      bw.bit(0) // no max_symbol shortcut
      items.foreach { case (sym, ebits, eval) =>
        bw.code(clCodes(sym), clLens(sym))
        if (ebits > 0) bw.bits(eval, ebits)
      }
    }

    def emit(bw: BitWriter, sym: Int): Unit = {
      if (simpleSyms != null) {
        if (simpleSyms.length == 2) bw.bit(if (sym == simpleSyms(0)) 0 else 1)
        // 1-symbol codes cost zero bits
      } else bw.code(codes(sym), lens(sym))
    }
  }

  /** (prefix code, extra-bit count, extra-bit value) for a 1-based value. */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    if (v <= 4) (v - 1, 0, 0)
    else {
      val x = v - 1
      val hb = 31 - Integer.numberOfLeadingZeros(x)
      val second = (x >> (hb - 1)) & 1
      (2 * hb + second, hb - 1, x - ((2 + second) << (hb - 1)))
    }
  }

  /** Greedy tokenization: distance-1 runs, then row copies (distance =
    * width — these ride the 2-D neighbor map's (0,1) slot on the wire,
    * when lz77), then color-cache hits, then literals — cache state
    * mirrors the decoder exactly (zero-initialized, updated on every
    * produced pixel). Tokens are (0=literal argb, _) | (1=cache idx, _)
    * | (2=copy len, dist). */
  private def buildTokens(px: Array[Int], width: Int, cacheBits: Int,
      lz77: Boolean): scala.collection.mutable.ArrayBuffer[(Int, Int, Int)] = {
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    def insert(argb: Int): Unit = if (cache != null) cache(cacheKey(argb, cacheBits)) = argb
    var i = 0
    while (i < px.length) {
      var taken = false
      if (lz77 && i > 0 && px(i) == px(i - 1)) {
        var l = 0
        while (i + l < px.length && px(i + l) == px(i + l - 1) && l < 4096) l += 1
        if (l >= 4) {
          tokens += ((2, l, 1))
          var j = 0
          while (j < l) { insert(px(i + j)); j += 1 }
          i += l
          taken = true
        }
      }
      if (!taken && lz77 && i >= width && px(i) == px(i - width)) {
        var l = 0
        while (i + l < px.length && px(i + l) == px(i + l - width) && l < 4096) l += 1
        if (l >= 4) {
          tokens += ((2, l, width))
          var j = 0
          while (j < l) { insert(px(i + j)); j += 1 }
          i += l
          taken = true
        }
      }
      if (!taken) {
        val v = px(i)
        if (cache != null && cache(cacheKey(v, cacheBits)) == v)
          tokens += ((1, cacheKey(v, cacheBits), 0))
        else tokens += ((0, v, 0))
        insert(v)
        i += 1
      }
    }
    tokens
  }

  /** Write one entropy-/spatially-coded image (cache bit, meta bit for
    * spatial, the five prefix codes, then the token stream). */
  private def writeImage(bw: BitWriter, px: Array[Int], width: Int, spatial: Boolean,
      cacheBits: Int, lz77: Boolean): Unit = {
    if (cacheBits > 0) { bw.bit(1); bw.bits(cacheBits, 4) } else bw.bit(0)
    if (spatial) bw.bit(0) // single prefix-code group, no meta image
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val tokens = buildTokens(px, width, cacheBits, lz77)
    // encodeDistance is a linear table search; memoize per distinct pixel
    // distance so the histogram and emit passes share one lookup each.
    val distMemo = scala.collection.mutable.HashMap.empty[Int, (Int, Int, Int)]
    def distTriple(d: Int): (Int, Int, Int) =
      distMemo.getOrElseUpdate(d, prefixEncode(encodeDistance(d, width)))
    val green = new Array[Int](256 + 24 + cacheSize)
    val red = new Array[Int](256)
    val blue = new Array[Int](256)
    val alpha = new Array[Int](256)
    val dist = new Array[Int](40)
    tokens.foreach {
      case (0, argb, _) =>
        green((argb >>> 8) & 0xff) += 1
        red((argb >>> 16) & 0xff) += 1
        blue(argb & 0xff) += 1
        alpha((argb >>> 24) & 0xff) += 1
      case (1, idx, _) => green(280 + idx) += 1
      case (_, len, d) =>
        green(256 + prefixEncode(len)._1) += 1
        dist(distTriple(d)._1) += 1
    }
    val codes = Array(green, red, blue, alpha, dist)
      .map(c => new BuiltCode(c, MaxCodeLength))
    codes.foreach(_.writeHeader(bw))
    tokens.foreach {
      case (0, argb, _) =>
        codes(0).emit(bw, (argb >>> 8) & 0xff)
        codes(1).emit(bw, (argb >>> 16) & 0xff)
        codes(2).emit(bw, argb & 0xff)
        codes(3).emit(bw, (argb >>> 24) & 0xff)
      case (1, idx, _) => codes(0).emit(bw, 280 + idx)
      case (_, len, d) =>
        val (lc, leb, lev) = prefixEncode(len)
        codes(0).emit(bw, 256 + lc)
        if (leb > 0) bw.bits(lev, leb)
        val (dc, deb, dev) = distTriple(d)
        codes(4).emit(bw, dc)
        if (deb > 0) bw.bits(dev, deb)
    }
  }

  private def subPixels(a: Int, b: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= ((((a >>> sh) & 0xff) - ((b >>> sh) & 0xff)) & 0xff) << sh
      sh += 8
    }
    out
  }

  /** Forward predictor: residuals against the ORIGINAL neighbors (the
    * decoder reconstructs them progressively to the same values). */
  private def forwardPredictor(px: Array[Int], w: Int, h: Int, mode: Int): Array[Int] = {
    val out = new Array[Int](px.length)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1)
          else if (x == 0) px(i - w)
          else predict(mode, px, i, w)
        out(i) = subPixels(px(i), pred)
        i += 1
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode ARGB pixels (row-major) as a lossless VP8L WebP. Intended for
    * fixtures and specs — determinism and spec-path coverage over ratio. */
  def encode(pxIn: Array[Int], w: Int, h: Int, opts: WebpOptions = WebpOptions()): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 16384 && h <= 16384 && pxIn.length == w * h,
      "pixels must match geometry (dims 1..16384)")
    require(opts.cacheBits >= 0 && opts.cacheBits <= 11, "cacheBits in 0..11")
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(if (pxIn.exists(p => (p >>> 24) != 0xff)) 1 else 0)
    bw.bits(0, 3) // version
    var px = pxIn.clone()
    var mainW = w // coded width of the spatially-coded image (palette bundles)
    if (opts.palette) {
      require(!opts.subtractGreen && opts.predictorMode < 0 && !opts.colorTransform,
        "palette excludes the arithmetic transforms here")
      val pal = scala.collection.mutable.ArrayBuffer.empty[Int]
      val idxOf = scala.collection.mutable.HashMap.empty[Int, Int]
      px.foreach(p => if (!idxOf.contains(p)) { idxOf(p) = pal.length; pal += p })
      require(pal.length <= 256, s"palette too large: ${pal.length}")
      bw.bit(1); bw.bits(3, 2)
      bw.bits(pal.length - 1, 8)
      val deltas = Array.tabulate(pal.length)(i =>
        if (i == 0) pal(0) else subPixels(pal(i), pal(i - 1)))
      writeImage(bw, deltas, deltas.length, spatial = false, cacheBits = 0, lz77 = false)
      val wb = bundleBits(pal.length)
      val bpp = 8 >> wb
      val codedW = subSize(w, wb)
      val packed = new Array[Int](codedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          packed(y * codedW + (x >> wb)) |=
            idxOf(px(y * w + x)) << ((x & ((1 << wb) - 1)) * bpp)
          x += 1
        }
        y += 1
      }
      px = packed.map(v => 0xff000000 | (v << 8))
      mainW = codedW
    } else {
      if (opts.subtractGreen) {
        bw.bit(1); bw.bits(2, 2)
        var i = 0
        while (i < px.length) {
          val v = px(i)
          val g = (v >>> 8) & 0xff
          px(i) = (v & 0xff00ff00) |
            (((((v >>> 16) & 0xff) - g) & 0xff) << 16) | (((v & 0xff) - g) & 0xff)
          i += 1
        }
      }
      if (opts.colorTransform) {
        bw.bit(1); bw.bits(1, 2)
        bw.bits(opts.colorBits - 2, 3)
        val g2r = opts.greenToRed & 0xff
        val g2b = opts.greenToBlue & 0xff
        val r2b = opts.redToBlue & 0xff
        var i = 0
        while (i < px.length) {
          val v = px(i)
          val g = (v >>> 8) & 0xff
          val r = (v >>> 16) & 0xff
          val b = v & 0xff
          // stored red/blue are what the decoder's adds will lift back;
          // red_to_blue keys on the ORIGINAL red (the decoder's newly
          // reconstructed red equals it)
          val sr = (r - ctDelta(g2r, g)) & 0xff
          val sb = (b - ctDelta(g2b, g) - ctDelta(r2b, r)) & 0xff
          px(i) = (v & 0xff00ff00) | (sr << 16) | sb
          i += 1
        }
        val subW = subSize(w, opts.colorBits)
        val subH = subSize(h, opts.colorBits)
        val cte = 0xff000000 | (r2b << 16) | (g2b << 8) | g2r
        writeImage(bw, Array.fill(subW * subH)(cte), subW, spatial = false,
          cacheBits = 0, lz77 = true)
      }
      if (opts.predictorMode >= 0) {
        require(opts.predictorMode <= 13 && opts.predictorBits >= 2 && opts.predictorBits <= 9,
          "predictor mode 0..13, bits 2..9")
        bw.bit(1); bw.bits(0, 2)
        bw.bits(opts.predictorBits - 2, 3)
        px = forwardPredictor(px, w, h, opts.predictorMode)
        val subW = subSize(w, opts.predictorBits)
        val subH = subSize(h, opts.predictorBits)
        writeImage(bw, Array.fill(subW * subH)(0xff000000 | (opts.predictorMode << 8)),
          subW, spatial = false, cacheBits = 0, lz77 = true)
      }
    }
    bw.bit(0) // end of transforms
    writeImage(bw, px, mainW, spatial = true, opts.cacheBits, opts.lz77)
    val payload = bw.toBytes
    val out = new java.io.ByteArrayOutputStream(payload.length + 20 + 1)
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    def le32(v: Int): Unit = { out.write(v); out.write(v >> 8); out.write(v >> 16); out.write(v >> 24) }
    tag("RIFF"); le32(4 + 8 + payload.length + (payload.length & 1)); tag("WEBP")
    tag("VP8L"); le32(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0) // RIFF 2-byte alignment
    out.toByteArray
  }
}
