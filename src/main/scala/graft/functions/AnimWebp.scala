package graft.functions

import java.awt.image.BufferedImage

/** Real animated-WebP decode — the extended-container animation chunks
  * (`VP8X`/`ANIM`/`ANMF`, RFC 9649 container layout). The JDK has NO WebP
  * reader at all; this module does the animation walk in pure JVM on top
  * of [[Webp]]'s VP8L decoder, the same layering [[Apng]] uses over the
  * JDK PNG codec:
  *
  *  - RIFF walk: `VP8X` (animation flag + 24-bit-LE canvas dims),
  *    `ANIM` (background color in [B, G, R, A] byte order + loop count),
  *    then the `ANMF` frame sequence
  *  - per ANMF: 16-byte header — x/2 and y/2 (frame offsets are stored
  *    halved, so they are always even), w-1/h-1, 24-bit duration, and a
  *    flags byte whose bit 1 is "do NOT blend" and bit 0 "dispose to
  *    background" — followed by the frame's own chunk list, from which
  *    the `VP8L` bitstream is extracted and decoded by [[Webp]] via a
  *    synthesized standalone container (the [[Apng]] frame-PNG trick)
  *  - compositing: blend 0 alpha-blends the frame onto the canvas
  *    (SrcOver), blend 1 overwrites the rect (Src); dispose 1 clears the
  *    frame rect to transparent black — the de-facto behavior of every
  *    libwebp-based renderer (Chrome/Firefox/the demuxer), which crawl
  *    data is authored against; the spec text names the ANIM background
  *    color instead, and the two agree exactly for the transparent
  *    background common muxers (and [[encodeAnimWebp]]) write
  *  - the canvas starts fully transparent (the libwebp rendering choice;
  *    any stream whose first frame covers the canvas — the overwhelming
  *    real-world shape — renders identically either way)
  *
  * Lossy (`VP8 `) frames need the full DCT stack and classify the whole
  * payload as undecodable (empty), the same honest stance as [[Webp]]'s
  * still path. Malformed/truncated payloads classify (empty/null), never
  * throw — the video-family contract. A still WebP (no animation flag)
  * is not an animation and classifies empty here; the still-image path
  * stays with [[Webp]]/[[ImageOps]].
  */
object AnimWebp {

  /** Canvas decompression-bomb bound, the [[Apng]]/[[Gif]] rationale. */
  private val MaxCanvasPixels = 1L << 22

  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

  private def u32le(b: Array[Byte], i: Int): Long = Riff.u32le(b, i)

  /** The walkable extent: the declared RIFF size when fully present
    * (trailing junk after it is tolerated, like every sibling decoder's
    * trailer handling), or -1 when the payload is truncated below it —
    * a truncation that cleanly severs a trailing ANMF must classify,
    * not silently drop frames. */
  private def riffEnd(bytes: Array[Byte]): Int = {
    val declared = 8L + u32le(bytes, 4)
    if (declared > bytes.length) -1 else declared.toInt
  }

  /** RIFF/WEBP whose first chunk is a VP8X carrying the animation flag
    * (bit 1 of the feature byte) AND an ANIM chunk exists — cheap header
    * walk, no payload decode. */
  def isAnimWebp(bytes: Array[Byte]): Boolean =
    Webp.isWebp(bytes) && {
      val end = riffEnd(bytes)
      var p = 12
      var anim = false
      var vp8xAnim = false
      var stop = end < 0
      while (!stop && p + 8 <= end) {
        val size = u32le(bytes, p + 4)
        if (size < 0 || size > end - p - 8) stop = true
        else {
          val typ = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
          if (typ == "VP8X" && size >= 10) vp8xAnim = (bytes(p + 8) & 0x02) != 0
          else if (typ == "ANIM") anim = true
          p += 8 + size.toInt + (size.toInt & 1)
        }
      }
      vp8xAnim && anim
    }

  private final case class Anmf(
      x: Int, y: Int, w: Int, h: Int, dispose: Int, blend: Int,
      dataOff: Int, dataEnd: Int)

  private final case class Parsed(
      canvasW: Int, canvasH: Int, background: Int, frames: Vector[Anmf])

  /** Full container parse; any structural violation → None. */
  private def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (!Webp.isWebp(bytes)) return None
    val end = riffEnd(bytes)
    if (end < 0) return None
    var canvasW = -1
    var canvasH = -1
    var background = 0
    var sawAnim = false
    var animFlag = false
    val frames = Vector.newBuilder[Anmf]
    var p = 12
    while (p + 8 <= end) {
      val size = u32le(bytes, p + 4)
      if (size < 0 || size > end - p - 8) return None
      val typ = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val off = p + 8
      typ match {
        case "VP8X" =>
          if (size < 10) return None
          animFlag = (bytes(off) & 0x02) != 0
          canvasW = 1 + u24le(bytes, off + 4)
          canvasH = 1 + u24le(bytes, off + 7)
        case "ANIM" =>
          if (size < 6) return None
          sawAnim = true
          // background rides [B, G, R, A] byte order on the wire
          background = ((bytes(off + 3) & 0xff) << 24) | ((bytes(off + 2) & 0xff) << 16) |
            ((bytes(off + 1) & 0xff) << 8) | (bytes(off) & 0xff)
        case "ANMF" =>
          if (size < 16) return None
          val x = 2 * u24le(bytes, off)
          val y = 2 * u24le(bytes, off + 3)
          val w = 1 + u24le(bytes, off + 6)
          val h = 1 + u24le(bytes, off + 9)
          val flags = bytes(off + 15) & 0xff
          frames += Anmf(x, y, w, h,
            dispose = flags & 1, blend = (flags >> 1) & 1,
            dataOff = off + 16, dataEnd = off + size.toInt)
        case _ => () // ICCP/EXIF/XMP/unknown: skipped, per the walk contract
      }
      p += 8 + size.toInt + (size.toInt & 1)
    }
    if (!animFlag || !sawAnim || canvasW <= 0 || canvasH <= 0) return None
    if (canvasW.toLong * canvasH > MaxCanvasPixels) return None
    val fs = frames.result()
    if (fs.isEmpty) return None
    if (fs.exists(f => f.x + f.w.toLong > canvasW || f.y + f.h.toLong > canvasH))
      return None
    Some(Parsed(canvasW, canvasH, background, fs))
  }

  /** Decode one ANMF's pixels: walk the frame's chunk list for the VP8L
    * bitstream, synthesize a standalone RIFF/WEBP around it, and hand it
    * to [[Webp]]. null when the frame is lossy (`VP8 `), absent, or the
    * bitstream is malformed / disagrees with the ANMF geometry. */
  private def decodeFrame(bytes: Array[Byte], f: Anmf): BufferedImage = {
    var p = f.dataOff
    while (p + 8 <= f.dataEnd) {
      val size = u32le(bytes, p + 4)
      if (size < 0 || size > f.dataEnd - p - 8) return null
      val typ = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (typ == "VP8L") {
        val payload = java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size.toInt)
        val img = Webp.decode(standalone(payload))
        return if (img != null && img.getWidth == f.w && img.getHeight == f.h) img
        else null
      }
      if (typ == "VP8 ") return null // lossy frame — honestly undecodable
      p += 8 + size.toInt + (size.toInt & 1) // ALPH/unknown: skip
    }
    null
  }

  /** Wrap a raw VP8L payload as a minimal standalone RIFF/WEBP. */
  private def standalone(vp8l: Array[Byte]): Array[Byte] = {
    val pad = vp8l.length & 1
    val out = new Array[Byte](20 + vp8l.length + pad)
    def tag(s: String, i: Int): Unit = { var k = 0; while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 } }
    def le32(v: Int, i: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >>> 8) & 0xff).toByte
      out(i + 2) = ((v >>> 16) & 0xff).toByte; out(i + 3) = ((v >>> 24) & 0xff).toByte
    }
    tag("RIFF", 0); le32(12 + vp8l.length + pad, 4); tag("WEBP", 8)
    tag("VP8L", 12); le32(vp8l.length, 16)
    System.arraycopy(vp8l, 0, out, 20, vp8l.length)
    out
  }

  /** Evenly-spaced sample of up to `n` distinct COMPOSITED frames with
    * SOURCE indices — the floor-spaced rule shared by the whole video
    * decode family. */
  def sampleFramesIndexed(bytes: Array[Byte], n: Int): Seq[(Int, BufferedImage)] = {
    if (n <= 0) return Seq.empty
    try {
      val parsed = parse(bytes).getOrElse(return Seq.empty)
      val m = parsed.frames.length
      val wanted = VideoContainers.floorSpacedIndices(m, n).toSet
      val maxIdx = wanted.max

      val canvas = new BufferedImage(
        parsed.canvasW, parsed.canvasH, BufferedImage.TYPE_INT_ARGB)
      val out = Seq.newBuilder[(Int, BufferedImage)]
      var i = 0
      while (i <= maxIdx) {
        val fr = parsed.frames(i)
        val patch = decodeFrame(bytes, fr)
        if (patch == null) return Seq.empty
        val g = canvas.createGraphics()
        try {
          if (fr.blend == 1) // do-not-blend: replace the rect, alpha included
            g.setComposite(java.awt.AlphaComposite.Src)
          g.drawImage(patch, fr.x, fr.y, null)
        } finally g.dispose()
        if (wanted.contains(i)) out += ((i, VideoContainers.copyArgb(canvas)))
        if (fr.dispose == 1) {
          // dispose to TRANSPARENT BLACK — the de-facto rendering every
          // libwebp-based consumer (Chrome/Firefox/the demuxer) applies;
          // the spec text names the ANIM background color instead, but
          // crawl data is authored against the renderers, and common
          // muxers write a transparent background anyway (the two agree
          // exactly then). The ANIM color is parsed/validated, not painted.
          val g2 = canvas.createGraphics()
          try {
            g2.setComposite(java.awt.AlphaComposite.Clear)
            g2.fillRect(fr.x, fr.y, fr.w, fr.h)
          } finally g2.dispose()
        }
        i += 1
      }
      out.result()
    } catch {
      case scala.util.control.NonFatal(_) => Seq.empty
    }
  }

  def frameCount(bytes: Array[Byte]): Int =
    try parse(bytes).map(_.frames.length).getOrElse(0)
    catch { case scala.util.control.NonFatal(_) => 0 }

  def decodeFirstFrame(bytes: Array[Byte]): BufferedImage =
    sampleFramesIndexed(bytes, 1).headOption.map(_._2).orNull

  /** One placed frame: (patch, x, y, disposeOp 0-1, blendOp 0-1) — the
    * [[Apng.Placed]] shape with WebP's op ranges. x/y must be even (the
    * wire stores them halved). */
  type Placed = (BufferedImage, Int, Int, Int, Int)

  /** Animated-WebP encode (the inverse surface): frame 0 defines the
    * canvas at (0,0); each frame's pixels ride a VP8L bitstream produced
    * by [[Webp.encode]] under `optsFor(frameIdx)` (so fixtures can cycle
    * transform families per frame). Background color defaults to
    * transparent black, the common muxer output. */
  def encodeAnimWebp(frames: Seq[Placed], background: Int = 0,
      optsFor: Int => Webp.WebpOptions = _ => Webp.WebpOptions()): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val (f0, x0, y0, _, _) = frames.head
    require(x0 == 0 && y0 == 0, "frame 0 defines the canvas and must sit at (0,0)")
    val (cw, ch) = (f0.getWidth, f0.getHeight)
    frames.foreach { case (f, x, y, d, b) =>
      require(x >= 0 && y >= 0 && (x & 1) == 0 && (y & 1) == 0,
        s"frame offsets must be even and non-negative, got ($x,$y)")
      require(x + f.getWidth <= cw && y + f.getHeight <= ch,
        s"patch ${f.getWidth}x${f.getHeight}@($x,$y) exceeds the ${cw}x$ch canvas")
      require(d >= 0 && d <= 1 && b >= 0 && b <= 1, "ANMF op out of range")
    }
    val bos = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = (0 until 4).foreach(i => bos.write(s.charAt(i)))
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def le24(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff); bos.write((v >>> 16) & 0xff)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      tag(typ); le32(data.length)
      bos.write(data, 0, data.length)
      if ((data.length & 1) == 1) bos.write(0) // RIFF 2-byte alignment
    }
    // per-frame VP8L chunks, extracted from the still encoder's container;
    // one pixel extraction per frame feeds both the encode and the VP8X
    // alpha-feature bit
    var hasAlpha = false
    val vp8ls = frames.zipWithIndex.map { case ((img, _, _, _, _), i) =>
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      if (!hasAlpha) hasAlpha = px.exists(p => (p >>> 24) != 0xff)
      val still = Webp.encode(px, w, h, optsFor(i))
      val range = Webp.vp8lRange(still)
      java.util.Arrays.copyOfRange(still, range._1, range._2)
    }
    tag("RIFF"); le32(0); tag("WEBP") // size back-patched below
    val vp8x = new java.io.ByteArrayOutputStream()
    vp8x.write(0x02 | (if (hasAlpha) 0x10 else 0)) // A (+ L) feature bits
    vp8x.write(0); vp8x.write(0); vp8x.write(0)
    def le24b(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >>> 8) & 0xff); o.write((v >>> 16) & 0xff)
    }
    le24b(vp8x, cw - 1); le24b(vp8x, ch - 1)
    chunk("VP8X", vp8x.toByteArray)
    val anim = new java.io.ByteArrayOutputStream()
    // [B, G, R, A] wire order, infinite loop (0)
    anim.write(background & 0xff); anim.write((background >>> 8) & 0xff)
    anim.write((background >>> 16) & 0xff); anim.write((background >>> 24) & 0xff)
    anim.write(0); anim.write(0)
    chunk("ANIM", anim.toByteArray)
    frames.zip(vp8ls).foreach { case ((img, x, y, d, b), vp8l) =>
      val fd = new java.io.ByteArrayOutputStream()
      le24b(fd, x / 2); le24b(fd, y / 2)
      le24b(fd, img.getWidth - 1); le24b(fd, img.getHeight - 1)
      le24b(fd, 50) // duration ms
      fd.write((b << 1) | d)
      fd.write('V'); fd.write('P'); fd.write('8'); fd.write('L')
      val lenB = vp8l.length
      fd.write(lenB & 0xff); fd.write((lenB >>> 8) & 0xff)
      fd.write((lenB >>> 16) & 0xff); fd.write((lenB >>> 24) & 0xff)
      fd.write(vp8l, 0, lenB)
      if ((lenB & 1) == 1) fd.write(0)
      chunk("ANMF", fd.toByteArray)
    }
    val out = bos.toByteArray
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte; out(5) = ((riffSize >>> 8) & 0xff).toByte
    out(6) = ((riffSize >>> 16) & 0xff).toByte; out(7) = ((riffSize >>> 24) & 0xff).toByte
    out
  }
}
