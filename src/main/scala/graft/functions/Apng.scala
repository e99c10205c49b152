package graft.functions

import java.awt.image.BufferedImage

/** Real animated-PNG (APNG) decode — the PNG third-edition animation
  * chunks (`acTL`/`fcTL`/`fdAT`, public W3C spec). The JDK has NO APNG
  * support: `ImageIO.read` silently returns only the default image. This
  * module does the animation work in pure JVM on top of the JDK's PNG
  * codec:
  *
  *  - chunk walk with per-chunk CRC-32 verification (a flipped bit
  *    classifies, never lies)
  *  - per frame, a standalone PNG is SYNTHESIZED — signature + the
  *    stream's IHDR patched to the frame's (w,h) + PLTE/tRNS copies +
  *    the frame's `fdAT` payloads re-wrapped as `IDAT` with recomputed
  *    CRCs + IEND — and decoded by the JDK codec (inflate + scanline
  *    defilter run on the real bitstream)
  *  - fcTL compositing semantics: (x,y) patch offsets, `blend_op`
  *    source/over, `dispose_op` none/background/previous (frame 0's
  *    `previous` degrades to `background`, per spec)
  *  - both stream shapes: fcTL-before-IDAT (the default image IS frame
  *    0) and fcTL-after-IDAT (the default image is NOT part of the
  *    animation)
  *
  * Malformed/truncated payloads classify (empty/null), never throw —
  * the [[Y4m]]/[[Avi]]/[[Gif]] contract. Plain PNGs (no `acTL`) are not
  * animations and classify empty here; the still-image path stays with
  * [[ImageOps]]/the png [[graft.sources.PayloadDecoder]].
  */
object Apng {

  private val Signature = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      (0 until 8).forall(i => (bytes(i) & 0xff) == Signature(i))

  /** PNG-with-acTL sniff (cheap: walks chunk headers only, no payloads).
    * Per spec acTL must precede IDAT — stop at the first IDAT. */
  def isApng(bytes: Array[Byte]): Boolean =
    isPng(bytes) && {
      var pos = 8
      var found = false
      var stop = false
      while (!stop && !found && pos + 8 <= bytes.length) {
        val len = u32(bytes, pos)
        val typ = typeAt(bytes, pos + 4)
        if (typ == "acTL") found = true
        else if (typ == "IDAT" || typ == "IEND") stop = true
        val next = pos + 12L + len
        if (len < 0 || next > bytes.length) stop = true else pos = next.toInt
      }
      found
    }

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def typeAt(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    parts.foreach(p => c.update(p))
    c.getValue
  }

  private final case class Chunk(typ: String, dataOff: Int, dataLen: Int)

  /** CRC-verified chunk walk; any structural violation → None. */
  private def chunks(bytes: Array[Byte]): Option[Vector[Chunk]] = {
    if (!isPng(bytes)) return None
    val out = Vector.newBuilder[Chunk]
    var pos = 8
    var ended = false
    while (!ended && pos + 12 <= bytes.length) {
      val len = u32(bytes, pos)
      if (len > Int.MaxValue - 12 || pos + 12L + len > bytes.length) return None
      val typ = typeAt(bytes, pos + 4)
      val crc = u32(bytes, (pos + 8 + len).toInt)
      val c = new java.util.zip.CRC32
      c.update(bytes, pos + 4, 4 + len.toInt)
      if (c.getValue != crc) return None
      out += Chunk(typ, pos + 8, len.toInt)
      if (typ == "IEND") ended = true
      pos = (pos + 12L + len).toInt
    }
    if (!ended) return None
    Some(out.result())
  }

  private final case class Fctl(
      seq: Long, w: Int, h: Int, x: Int, y: Int, dispose: Int, blend: Int)

  private final case class Frame(fctl: Fctl, data: Vector[Array[Byte]])

  /** One frame's standalone PNG: IHDR dims patched to the fcTL's (w,h),
    * PLTE/tRNS copied, data re-wrapped as IDAT with fresh CRCs. */
  private def framePng(bytes: Array[Byte], ihdr: Chunk,
      aux: Seq[Chunk], f: Frame): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    Signature.foreach(bos.write)
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      bos.write((len >>> 24) & 0xff); bos.write((len >>> 16) & 0xff)
      bos.write((len >>> 8) & 0xff); bos.write(len & 0xff)
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bos.write(t, 0, 4)
      bos.write(data, 0, len)
      val crc = crc32(t, data)
      bos.write(((crc >>> 24) & 0xff).toInt); bos.write(((crc >>> 16) & 0xff).toInt)
      bos.write(((crc >>> 8) & 0xff).toInt); bos.write((crc & 0xff).toInt)
    }
    val hdr = java.util.Arrays.copyOfRange(bytes, ihdr.dataOff, ihdr.dataOff + ihdr.dataLen)
    hdr(0) = ((f.fctl.w >>> 24) & 0xff).toByte; hdr(1) = ((f.fctl.w >>> 16) & 0xff).toByte
    hdr(2) = ((f.fctl.w >>> 8) & 0xff).toByte; hdr(3) = (f.fctl.w & 0xff).toByte
    hdr(4) = ((f.fctl.h >>> 24) & 0xff).toByte; hdr(5) = ((f.fctl.h >>> 16) & 0xff).toByte
    hdr(6) = ((f.fctl.h >>> 8) & 0xff).toByte; hdr(7) = (f.fctl.h & 0xff).toByte
    writeChunk("IHDR", hdr)
    aux.foreach(c => writeChunk(c.typ,
      java.util.Arrays.copyOfRange(bytes, c.dataOff, c.dataOff + c.dataLen)))
    f.data.foreach(d => writeChunk("IDAT", d))
    writeChunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Evenly-spaced sample of up to `n` distinct COMPOSITED frames with
    * SOURCE indices — the floor-spaced rule shared by the whole video
    * decode family. */
  def sampleFramesIndexed(bytes: Array[Byte], n: Int): Seq[(Int, BufferedImage)] = {
    if (n <= 0) return Seq.empty
    try {
      val cs = chunks(bytes).getOrElse(return Seq.empty)
      if (!cs.exists(_.typ == "acTL")) return Seq.empty
      val ihdr = cs.find(_.typ == "IHDR").getOrElse(return Seq.empty)
      if (ihdr.dataLen < 13) return Seq.empty
      val sw = u32(bytes, ihdr.dataOff).toInt
      val sh = u32(bytes, ihdr.dataOff + 4).toInt
      // decompression-bomb bound, same rationale as [[Gif]]
      if (sw <= 0 || sh <= 0 || sw.toLong * sh > (1L << 22)) return Seq.empty
      val aux = cs.filter(c => c.typ == "PLTE" || c.typ == "tRNS")

      // assemble frames: an fcTL opens a frame; IDAT data belongs to the
      // pre-IDAT fcTL (frame 0) if one exists; fdAT data (seq u32 prefix
      // stripped) to the most recent fcTL
      var frames = Vector.empty[Frame]
      var current: Option[(Fctl, Vector[Array[Byte]])] = None
      var sawIdat = false
      def flush(): Unit = current.foreach { case (f, d) =>
        if (d.nonEmpty) frames :+= Frame(f, d)
        current = None
      }
      cs.foreach { c =>
        c.typ match {
          case "fcTL" =>
            if (c.dataLen < 26) return Seq.empty
            flush()
            val f = Fctl(
              seq = u32(bytes, c.dataOff),
              w = u32(bytes, c.dataOff + 4).toInt,
              h = u32(bytes, c.dataOff + 8).toInt,
              x = u32(bytes, c.dataOff + 12).toInt,
              y = u32(bytes, c.dataOff + 16).toInt,
              dispose = bytes(c.dataOff + 24) & 0xff,
              blend = bytes(c.dataOff + 25) & 0xff)
            if (f.w <= 0 || f.h <= 0 || f.x < 0 || f.y < 0 ||
                f.x.toLong + f.w > sw || f.y.toLong + f.h > sh ||
                f.dispose > 2 || f.blend > 1) return Seq.empty
            current = Some((f, Vector.empty))
          case "IDAT" =>
            sawIdat = true
            current match {
              case Some((f, d)) if frames.isEmpty =>
                // a pre-IDAT fcTL claims the default image as frame 0
                current = Some((f, d :+ java.util.Arrays.copyOfRange(
                  bytes, c.dataOff, c.dataOff + c.dataLen)))
              case _ => () // default image not part of the animation
            }
          case "fdAT" =>
            if (c.dataLen < 4) return Seq.empty
            current match {
              case Some((f, d)) =>
                current = Some((f, d :+ java.util.Arrays.copyOfRange(
                  bytes, c.dataOff + 4, c.dataOff + c.dataLen)))
              case None => return Seq.empty // fdAT before any fcTL
            }
          case _ => ()
        }
      }
      flush()
      if (!sawIdat || frames.isEmpty) return Seq.empty

      val m = frames.length
      val wanted = VideoContainers.floorSpacedIndices(m, n).toSet
      val maxIdx = wanted.max

      val canvas = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_ARGB)
      val out = Seq.newBuilder[(Int, BufferedImage)]
      var previous: BufferedImage = null
      var i = 0
      while (i <= maxIdx) {
        val fr = frames(i)
        val patch = ImageOps.decode(framePng(bytes, ihdr, aux, fr))
        if (patch == null || patch.getWidth != fr.fctl.w ||
            patch.getHeight != fr.fctl.h) return Seq.empty
        // frame 0 dispose "previous" degrades to "background" (spec)
        val dispose = if (i == 0 && fr.fctl.dispose == 2) 1 else fr.fctl.dispose
        if (dispose == 2) previous = copy(canvas)
        val g = canvas.createGraphics()
        try {
          if (fr.fctl.blend == 0) // source: replace the rect, alpha included
            g.setComposite(java.awt.AlphaComposite.Src)
          g.drawImage(patch, fr.fctl.x, fr.fctl.y, null)
        } finally g.dispose()
        if (wanted.contains(i)) out += ((i, copy(canvas)))
        dispose match {
          case 1 =>
            val g2 = canvas.createGraphics()
            try {
              g2.setComposite(java.awt.AlphaComposite.Clear)
              g2.fillRect(fr.fctl.x, fr.fctl.y, fr.fctl.w, fr.fctl.h)
            } finally g2.dispose()
          case 2 if previous != null =>
            val g2 = canvas.createGraphics()
            try {
              g2.setComposite(java.awt.AlphaComposite.Src)
              g2.drawImage(previous, 0, 0, null)
            } finally g2.dispose()
          case _ => ()
        }
        i += 1
      }
      out.result()
    } catch {
      case scala.util.control.NonFatal(_) => Seq.empty
    }
  }

  def frameCount(bytes: Array[Byte]): Int =
    try {
      val cs = chunks(bytes).getOrElse(return 0)
      if (!cs.exists(_.typ == "acTL")) return 0
      val fctls = cs.count(_.typ == "fcTL")
      // the non-animated default image (no pre-IDAT fcTL) is not a frame
      fctls
    } catch { case scala.util.control.NonFatal(_) => 0 }

  def decodeFirstFrame(bytes: Array[Byte]): BufferedImage =
    sampleFramesIndexed(bytes, 1).headOption.map(_._2).orNull

  private def copy(img: BufferedImage): BufferedImage =
    VideoContainers.copyArgb(img)

  /** One placed frame: (patch, x, y, disposeOp 0-2, blendOp 0-1). */
  type Placed = (BufferedImage, Int, Int, Int, Int)

  /** APNG encode (the inverse surface): frame 0 becomes the default
    * image + pre-IDAT fcTL (so it IS part of the animation and defines
    * the canvas at (0,0)); later frames become fcTL+fdAT with their PNG
    * data produced by the JDK codec. Set `defaultImageExcluded` to emit
    * the OTHER stream shape: the default image stays a plain IDAT with
    * no fcTL, and every animation frame rides fdAT. */
  def encodeApng(frames: Seq[Placed], defaultImageExcluded: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val (f0, x0, y0, _, _) = frames.head
    require(x0 == 0 && y0 == 0, "frame 0 defines the canvas and must sit at (0,0)")
    val (sw, sh) = (f0.getWidth, f0.getHeight)
    frames.foreach { case (f, x, y, d, b) =>
      require(x >= 0 && y >= 0 && x + f.getWidth <= sw && y + f.getHeight <= sh,
        s"patch ${f.getWidth}x${f.getHeight}@($x,$y) exceeds the ${sw}x$sh canvas")
      require(d >= 0 && d <= 2 && b >= 0 && b <= 1, "fcTL op out of range")
    }
    // PNG-encode each patch through the JDK codec; all patches must agree
    // on IHDR params (depth/color type) apart from dimensions
    def pngOf(img: BufferedImage): Array[Byte] = {
      val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics()
      try g.drawImage(img, 0, 0, null)
      finally g.dispose()
      ImageOps.encode(rgb, "png")
    }
    def idatOf(png: Array[Byte]): (Array[Byte], Array[Byte]) = {
      val cs = chunks(png).get
      val ihdr = cs.find(_.typ == "IHDR").get
      val hdr = java.util.Arrays.copyOfRange(png, ihdr.dataOff, ihdr.dataOff + ihdr.dataLen)
      val data = cs.filter(_.typ == "IDAT").flatMap(c =>
        java.util.Arrays.copyOfRange(png, c.dataOff, c.dataOff + c.dataLen)).toArray
      (hdr, data)
    }
    val encoded = frames.map { case (f, x, y, d, b) => (idatOf(pngOf(f)), x, y, d, b) }
    val hdr0 = encoded.head._1._1
    require(encoded.forall { case ((h, _), _, _, _, _) =>
      java.util.Arrays.equals(h.drop(8), hdr0.drop(8)) }, // dims differ, params must not
      "all frames must share IHDR depth/color parameters")

    val bos = new java.io.ByteArrayOutputStream()
    Signature.foreach(bos.write)
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      bos.write((len >>> 24) & 0xff); bos.write((len >>> 16) & 0xff)
      bos.write((len >>> 8) & 0xff); bos.write(len & 0xff)
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bos.write(t, 0, 4)
      bos.write(data, 0, len)
      val crc = crc32(t, data)
      bos.write(((crc >>> 24) & 0xff).toInt); bos.write(((crc >>> 16) & 0xff).toInt)
      bos.write(((crc >>> 8) & 0xff).toInt); bos.write((crc & 0xff).toInt)
    }
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    var seq = 0L
    def fctlBytes(f: BufferedImage, x: Int, y: Int, d: Int, b: Int): Array[Byte] = {
      val out = be32(seq) ++ be32(f.getWidth.toLong) ++ be32(f.getHeight.toLong) ++
        be32(x.toLong) ++ be32(y.toLong) ++
        Array[Byte](0, 1, 0, 100) ++ // delay 1/100 s
        Array[Byte](d.toByte, b.toByte)
      seq += 1
      out
    }
    writeChunk("IHDR", hdr0)
    val animFrames = if (defaultImageExcluded) encoded else encoded.tail
    writeChunk("acTL", be32(animFrames.length.toLong +
      (if (defaultImageExcluded) 0 else 1)) ++ be32(0))
    if (!defaultImageExcluded) {
      val ((_, data0), x, y, d, b) = encoded.head
      writeChunk("fcTL", fctlBytes(frames.head._1, x, y, d, b))
      writeChunk("IDAT", data0)
    } else {
      // default image (not an animation frame): frame 0's pixels as IDAT
      writeChunk("IDAT", encoded.head._1._2)
    }
    animFrames.zip(if (defaultImageExcluded) frames else frames.tail).foreach {
      case (((_, data), x, y, d, b), (img, _, _, _, _)) =>
        writeChunk("fcTL", fctlBytes(img, x, y, d, b))
        writeChunk("fdAT", be32(seq) ++ data)
        seq += 1
    }
    writeChunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }
}
