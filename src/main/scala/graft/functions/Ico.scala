package graft.functions

import java.awt.image.BufferedImage

/** Real ICO (favicon) decode — the Windows icon container every crawl
  * fetches constantly (`/favicon.ico`, `<link rel="icon">`) and the JDK
  * has NO reader for. Public layout (Microsoft ICONDIR/ICONDIRENTRY +
  * the in-resource DIB, or an embedded PNG member since Vista):
  *
  *  - ICONDIR: reserved 0, type 1 (ICO), count; then 16-byte entries —
  *    width/height bytes (0 encodes 256), bit count, resource size and
  *    offset
  *  - a member is either a PNG (signature-sniffed; decoded by the JDK
  *    codec) or a BITMAPINFOHEADER DIB whose biHeight is DOUBLED (XOR
  *    pixels + a 1-bit AND transparency mask, both bottom-up with 4-byte
  *    row stride): palette depths 1/4/8, BGR 24, BGRA 32
  *  - 32-bit members: when any alpha byte is nonzero the alpha channel
  *    wins and the AND mask is ignored (the convention libico/Windows
  *    renderers apply); an all-zero alpha plane defers to the AND mask
  *  - the directory may carry many sizes: [[decode]] picks the BEST
  *    member — largest area, then highest bit depth — the selection a
  *    thumbnail/phash pipeline wants
  *
  * Malformed/truncated payloads classify (null), never throw — the
  * [[Qoi]]/[[Webp]] image-family contract. Decode is exact for DIB
  * members (no quantization anywhere), so the registry declares the
  * format lossless.
  */
object Ico {

  /** Canvas bound per member, the family's decompression-bomb stance. */
  private val MaxPixels = 1L << 22

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  private def u16le(b: Array[Byte], i: Int): Int = Riff.u16le(b, i)
  private def u32le(b: Array[Byte], i: Int): Long = Riff.u32le(b, i)
  private def i32le(b: Array[Byte], i: Int): Int = u32le(b, i).toInt

  /** ICONDIR sniff: the magic is weak (00 00 01 00), so also require a
    * sane entry table whose first resource lies inside the payload. */
  def isIco(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 22 &&
      bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 1 && bytes(3) == 0 && {
        val count = u16le(bytes, 4)
        count >= 1 && 6 + 16L * count <= bytes.length && {
          val off = u32le(bytes, 6 + 12)
          val size = u32le(bytes, 6 + 8)
          off >= 6 + 16L * count && size >= 1 && off + size <= bytes.length
        }
      }

  /** One directory entry PLUS the geometry/depth read from the member's
    * OWN header — ICONDIRENTRY w/h/bitCount are unreliable in the wild
    * (encoders commonly zero bitCount; width/height bytes can lie), so
    * selection must trust the resource, not the table. */
  private final case class Entry(w: Int, h: Int, bitCount: Int, off: Int, size: Int)

  /** The valid, header-readable entries — a corrupt or truncated TAIL
    * entry must not classify a file whose other members are intact
    * (truncated-tail favicons are common in crawls); at least one
    * member must survive or the walk fails. */
  private def entries(bytes: Array[Byte]): Vector[Entry] = {
    val count = u16le(bytes, 4)
    if (count < 1) fail()
    if (6 + 16L * count > bytes.length) fail()
    val out = (0 until count).flatMap { i =>
      val e = 6 + 16 * i
      val size = u32le(bytes, e + 8)
      val off = u32le(bytes, e + 12)
      if (size < 1 || off < 6 + 16L * count || off + size > bytes.length) None
      else memberHeader(bytes, off.toInt, size.toInt).map { case (w, h, bc) =>
        Entry(w, h, bc, off.toInt, size.toInt)
      }
    }.toVector
    if (out.isEmpty) fail()
    out
  }

  /** (w, h, depth) from the member's own header: the PNG IHDR or the DIB
    * BITMAPINFOHEADER. None when the header is unreadable. */
  private def memberHeader(bytes: Array[Byte], off: Int, size: Int): Option[(Int, Int, Int)] =
    if (isPngMember(bytes, off, size)) {
      if (size < 24) None
      else {
        def be32(i: Int): Long = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
          ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
        val w = be32(off + 16); val h = be32(off + 20)
        if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
        else Some((w.toInt, h.toInt, 32)) // PNG members rank as deepest
      }
    } else if (size >= 40 && i32le(bytes, off) >= 40) {
      val w = i32le(bytes, off + 4)
      val h2 = i32le(bytes, off + 8)
      val bpp = u16le(bytes, off + 14)
      if (w < 1 || h2 < 2 || (h2 & 1) != 0) None else Some((w, h2 / 2, bpp))
    } else None

  private val PngSig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def isPngMember(bytes: Array[Byte], off: Int, size: Int): Boolean =
    size >= 8 && (0 until 8).forall(i => (bytes(off + i) & 0xff) == PngSig(i))

  /** Decode one DIB member (BITMAPINFOHEADER + palette + XOR + AND). */
  private def decodeDib(bytes: Array[Byte], off: Int, size: Int): BufferedImage = {
    val end = off + size
    if (size < 40) fail()
    val biSize = i32le(bytes, off)
    if (biSize < 40 || off + biSize > end) fail()
    val w = i32le(bytes, off + 4)
    val h2 = i32le(bytes, off + 8) // DOUBLED: XOR plane + AND plane
    val bpp = u16le(bytes, off + 14)
    val compression = i32le(bytes, off + 16)
    if (w <= 0 || h2 <= 0 || (h2 & 1) != 0) fail()
    val h = h2 / 2
    if (w.toLong * h > MaxPixels) fail()
    if (compression != 0) fail() // BI_RGB only; RLE/bitfields classify
    val paletteSize = bpp match {
      case 1 | 4 | 8 =>
        val used = i32le(bytes, off + 32)
        if (used == 0) 1 << bpp
        else if (used < 0 || used > (1 << bpp)) fail()
        else used
      case 24 | 32 => 0
      case _ => fail()
    }
    val palOff = off + biSize
    if (palOff + 4L * paletteSize > end) fail()
    val palette = Array.tabulate(paletteSize) { i =>
      val p = palOff + 4 * i // BGRA quads, alpha byte reserved
      0xff000000 | ((bytes(p + 2) & 0xff) << 16) |
        ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
    }
    val xorOff = palOff + 4 * paletteSize
    val xorStride = ((w * bpp + 31) / 32) * 4
    val andStride = ((w + 31) / 32) * 4
    if (xorOff + xorStride.toLong * h > end) fail()
    // some PNG-to-ICO converters omit the AND plane on 32-bpp members
    // (the alpha channel supersedes it); tolerate that for 32-bpp only —
    // every other depth genuinely needs the mask for transparency
    val hasAndPlane = xorOff + xorStride.toLong * h + andStride.toLong * h <= end
    if (bpp != 32 && !hasAndPlane) fail()
    val andOff = xorOff + xorStride * h

    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var anyAlpha = false
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = xorOff + xorStride * (h - 1 - y) // bottom-up
      var x = 0
      while (x < w) {
        val argb = bpp match {
          case 32 =>
            val p = row + 4 * x
            val a = bytes(p + 3) & 0xff
            if (a != 0) anyAlpha = true
            (a << 24) | ((bytes(p + 2) & 0xff) << 16) |
              ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
          case 24 =>
            val p = row + 3 * x
            0xff000000 | ((bytes(p + 2) & 0xff) << 16) |
              ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
          case 8 =>
            val idx = bytes(row + x) & 0xff
            if (idx >= paletteSize) fail()
            palette(idx)
          case 4 =>
            val b = bytes(row + x / 2) & 0xff
            val idx = if ((x & 1) == 0) b >> 4 else b & 0xf
            if (idx >= paletteSize) fail()
            palette(idx)
          case _ => // 1
            val b = bytes(row + x / 8) & 0xff
            val idx = (b >> (7 - (x & 7))) & 1
            if (idx >= paletteSize) fail()
            palette(idx)
        }
        px(y * w + x) = argb
        x += 1
      }
      y += 1
    }
    // the AND mask applies unless a 32bpp member carries real alpha; a
    // 32bpp member with NEITHER (zero alpha plane, omitted mask) is
    // rendered opaque — the intent of the converters that emit them
    if (!(bpp == 32 && anyAlpha)) {
      y = 0
      while (y < h) {
        val row = andOff + andStride * (h - 1 - y)
        var x = 0
        while (x < w) {
          val bit =
            if (hasAndPlane) ((bytes(row + x / 8) & 0xff) >> (7 - (x & 7))) & 1
            else 0
          if (bit == 1) px(y * w + x) = px(y * w + x) & 0x00ffffff
          else px(y * w + x) = px(y * w + x) | 0xff000000
          x += 1
        }
        y += 1
      }
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  /** Number of directory entries, 0 when not an ICO. */
  def imageCount(bytes: Array[Byte]): Int =
    try { if (!isIco(bytes)) 0 else entries(bytes).length }
    catch { case _: Malformed => 0; case scala.util.control.NonFatal(_) => 0 }

  /** Decode the BEST member (largest area, then deepest, judged from the
    * members' own headers): the selection a thumbnail/phash pipeline
    * wants. null classifies, never throws. */
  def decode(bytes: Array[Byte]): BufferedImage =
    try {
      if (!isIco(bytes)) return null
      val best = entries(bytes).maxBy(e => (e.w.toLong * e.h, e.bitCount))
      // the per-member bomb cap applies to PNG members too — the IHDR
      // dims are already validated by the header peek above
      if (best.w.toLong * best.h > MaxPixels) return null
      if (isPngMember(bytes, best.off, best.size))
        ImageOps.decode(java.util.Arrays.copyOfRange(
          bytes, best.off, best.off + best.size))
      else decodeDib(bytes, best.off, best.size)
    } catch {
      case _: Malformed => null
      case scala.util.control.NonFatal(_) => null
    }

  /** One member to encode: ARGB pixels + bit depth (1/4/8/24/32), or
    * depth 0 for an embedded PNG member. */
  final case class Member(px: Array[Int], w: Int, h: Int, depth: Int)

  /** ICO encode (the inverse surface, fixture/test side): each member as
    * a DIB of its depth — palette depths collect the distinct colors and
    * require they fit — or an embedded PNG for depth 0. The AND mask is
    * derived from pixel alpha (<128 → masked); 32-bit members keep their
    * alpha channel too. */
  def encode(members: Seq[Member]): Array[Byte] = {
    require(members.nonEmpty, "at least one member")
    val blobs = members.map { m =>
      require(m.w >= 1 && m.w <= 256 && m.h >= 1 && m.h <= 256,
        s"ICO members are 1..256 px, got ${m.w}x${m.h}")
      require(m.px.length == m.w * m.h, "pixel count mismatch")
      if (m.depth == 0) ImageOps.encode(ImageOps.toImage(m.px, m.w, m.h), "png")
      else encodeDib(m)
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    w16(0); w16(1); w16(members.length)
    var off = 6 + 16 * members.length
    members.zip(blobs).foreach { case (m, blob) =>
      bos.write(if (m.w == 256) 0 else m.w)
      bos.write(if (m.h == 256) 0 else m.h)
      bos.write(0); bos.write(0) // colorCount (0 = >=256 or N/A), reserved
      w16(1); w16(if (m.depth == 0) 32 else m.depth)
      w32(blob.length); w32(off)
      off += blob.length
    }
    blobs.foreach(b => bos.write(b, 0, b.length))
    bos.toByteArray
  }

  private def encodeDib(m: Member): Array[Byte] = {
    require(Set(1, 4, 8, 24, 32).contains(m.depth), s"depth ${m.depth}")
    val palette: Array[Int] =
      if (m.depth > 8) Array.empty[Int]
      else {
        val colors = m.px.map(_ & 0xffffff).distinct.sorted
        require(colors.length <= (1 << m.depth),
          s"${colors.length} colors exceed ${m.depth}bpp")
        colors.padTo(1 << m.depth, 0)
      }
    val colorIndex: Map[Int, Int] =
      if (m.depth > 8) Map.empty else palette.zipWithIndex.toMap
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    w32(40); w32(m.w); w32(2 * m.h) // doubled height: XOR + AND planes
    w16(1); w16(m.depth)
    w32(0); w32(0); w32(0); w32(0); w32(0); w32(0)
    palette.foreach { c =>
      bos.write(c & 0xff); bos.write((c >>> 8) & 0xff)
      bos.write((c >>> 16) & 0xff); bos.write(0)
    }
    val xorStride = ((m.w * m.depth + 31) / 32) * 4
    (m.h - 1 to 0 by -1).foreach { y => // bottom-up
      val row = new Array[Byte](xorStride)
      (0 until m.w).foreach { x =>
        val p = m.px(y * m.w + x)
        m.depth match {
          case 32 =>
            row(4 * x) = (p & 0xff).toByte
            row(4 * x + 1) = ((p >>> 8) & 0xff).toByte
            row(4 * x + 2) = ((p >>> 16) & 0xff).toByte
            row(4 * x + 3) = ((p >>> 24) & 0xff).toByte
          case 24 =>
            row(3 * x) = (p & 0xff).toByte
            row(3 * x + 1) = ((p >>> 8) & 0xff).toByte
            row(3 * x + 2) = ((p >>> 16) & 0xff).toByte
          case 8 => row(x) = colorIndex(p & 0xffffff).toByte
          case 4 =>
            val idx = colorIndex(p & 0xffffff)
            row(x / 2) = (if ((x & 1) == 0) (row(x / 2) | (idx << 4))
            else (row(x / 2) | idx)).toByte
          case _ =>
            val idx = colorIndex(p & 0xffffff)
            row(x / 8) = (row(x / 8) | (idx << (7 - (x & 7)))).toByte
        }
      }
      bos.write(row, 0, xorStride)
    }
    val andStride = ((m.w + 31) / 32) * 4
    (m.h - 1 to 0 by -1).foreach { y =>
      val row = new Array[Byte](andStride)
      (0 until m.w).foreach { x =>
        if (((m.px(y * m.w + x) >>> 24) & 0xff) < 128)
          row(x / 8) = (row(x / 8) | (1 << (7 - (x & 7)))).toByte
      }
      bos.write(row, 0, andStride)
    }
    bos.toByteArray
  }
}
