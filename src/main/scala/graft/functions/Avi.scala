package graft.functions

import java.awt.image.BufferedImage

/** Real COMPRESSED-video decode inside the RIFF/AVI container (the oldest
  * interchange format still in the wild — OpenDML/AVI 1.0, Microsoft 1992
  * public spec), two codecs by the vids stream's strf biCompression:
  * Motion-JPEG (every frame a standalone baseline JPEG through the JDK's
  * real ImageIO codec — Huffman+DCT) and Microsoft RLE8 (biCompression=1
  * — a genuinely INTER-FRAME delta codec, composited via [[Rle8]]). Only
  * modern inter-frame codecs (H.264/VP9/…) stay behind the clearly-marked
  * stub — those need codec libraries this container doesn't ship.
  *
  * The reference's converter plugin registry (`src/converters/base.py:
  * 10-27`) dispatches payload decoders by format; this decoder slots in
  * beside [[Y4m]] the same way. Layout (public spec):
  * {{{
  *   "RIFF" <u32> "AVI "
  *     LIST <u32> "hdrl"
  *       "avih" <u32 56> dwMicroSecPerFrame … dwTotalFrames@16
  *                       dwStreams@24 dwWidth@32 dwHeight@36 …
  *       LIST <u32> "strl"  ("strh" fccType=vids|auds…, "strf" …)  — one
  *                          per stream, in stream-number order
  *     LIST <u32> "movi"
  *       ( "##dc" | "##db" <u32 size> <one JPEG> [pad]
  *       | LIST <u32> "rec " (frame chunks…) )*     — ## = stream number
  *     [ "idx1" … ]
  * }}}
  * The walk matters: real AVIs carry JUNK/INFO/idx1 chunks, wrap frame
  * groups in `LIST rec ` interleave records (the Video-for-Windows CD
  * layout), and interleave audio (`01wb`) between video chunks — fixed
  * offsets or a flat scan would misparse all three. Frame chunks are bound
  * to the FIRST `vids` stream declared in hdrl (a second video stream or
  * an audio stream must not pollute the frame sequence). All sizes
  * advance in Long and clamp to the payload end ([[Wav]]'s hostile-size
  * discipline); `rec ` recursion is depth-1 by spec, so hostile deep
  * nesting cannot overflow the stack.
  *
  * Contract matches [[Y4m]]/[[ImageOps.decode]]: malformed, truncated or
  * null payloads yield None/empty — never a throw. A corrupt video row
  * must CLASSIFY, not abort the stage at 100 TB.
  */
object Avi {

  /** Container facts + per-frame chunk slices (offset,length) in stream
    * order. `w`/`h` come from avih; frames are the selected video stream's
    * movi `##dc`/`##db` chunks. `compression` is the vids strf
    * biCompression (0 = BI_RGB uncompressed DIB, 1 = BI_RLE8 inter-frame
    * delta coding, 'MJPG' fourcc = Motion-JPEG); `palette` the strf color
    * table (ARGB, 256 entries) for 8-bit streams, null otherwise;
    * `bitCount` the strf biBitCount; `topDown` when strf biHeight is
    * NEGATIVE (the DIB convention for top-down row order — positive
    * heights store rows bottom-up). */
  final case class Parsed(w: Int, h: Int, frames: IndexedSeq[(Int, Int)],
      compression: Long = 0L, palette: Array[Int] = null,
      bitCount: Int = 0, topDown: Boolean = false) {
    def frameCount: Int = frames.length
    /** Inter-frame RLE8 stream: frames are delta chunks onto a shared
      * canvas, so decode is sequential ([[Rle8]]). */
    def isRle8: Boolean = compression == 1L && palette != null
    /** Uncompressed DIB stream (BI_RGB): 24-bit BGR or 8-bit paletted
      * rows, 4-byte-aligned stride, bottom-up unless `topDown`. */
    def isDib: Boolean = compression == 0L &&
      (bitCount == 24 || (bitCount == 8 && palette != null))
  }

  private val BiRle8 = 1L

  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  /** RIFF/"AVI " signature — the one source of truth for container
    * sniffing ([[VideoContainers]] routes on this). */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourcc(bytes, 0, "RIFF") && fourcc(bytes, 8, "AVI ")

  /** Video frame chunk id for the selected stream: "##dc" (compressed) /
    * "##db" (uncompressed-tagged; MJPEG writers use both). `stream` < 0
    * accepts any stream (no strl metadata survived to identify one). */
  private def isFrameChunk(b: Array[Byte], i: Int, stream: Int): Boolean =
    b(i) >= '0' && b(i) <= '9' && b(i + 1) >= '0' && b(i + 1) <= '9' &&
      b(i + 2) == 'd'.toByte && (b(i + 3) == 'c'.toByte || b(i + 3) == 'b'.toByte) &&
      (stream < 0 || (b(i) - '0') * 10 + (b(i + 1) - '0') == stream)

  def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (!isAvi(bytes)) return None
    var w = -1; var h = -1
    var streamCount = 0
    var vidStream = -1 // hdrl strl order gives each stream its movi number
    var compression = 0L
    var palette: Array[Int] = null
    var bitCount = 0
    var topDown = false
    val frames = IndexedSeq.newBuilder[(Int, Int)]

    // the selected vids stream's strf (BITMAPINFOHEADER + color table):
    // biCompression decides the frame decode path (JPEG vs DIB vs
    // inter-frame RLE8), a NEGATIVE biHeight flips row order to top-down,
    // and 8-bit streams carry the palette as BGRX quads after the
    // 40-byte header
    def readStrf(body: Int, avail: Int): Unit = {
      compression = u32(bytes, body + 16)
      bitCount = (bytes(body + 14) & 0xff) | ((bytes(body + 15) & 0xff) << 8)
      topDown = (u32(bytes, body + 8) & 0x80000000L) != 0L // biHeight < 0
      if (bitCount == 8) {
        val clrUsed = u32(bytes, body + 32)
        val declared = if (clrUsed <= 0L || clrUsed > 256L) 256 else clrUsed.toInt
        val present = math.min(declared, math.max(0, (avail - 40) / 4))
        val pal = Array.fill(256)(0xff000000) // missing entries: opaque black
        var i = 0
        while (i < present) {
          val b = bytes(body + 40 + 4 * i) & 0xff
          val g = bytes(body + 41 + 4 * i) & 0xff
          val r = bytes(body + 42 + 4 * i) & 0xff
          pal(i) = 0xff000000 | (r << 16) | (g << 8) | b
          i += 1
        }
        palette = pal
      }
    }

    def walkHdrl(start: Int, end: Int): Unit = {
      var sp = start
      while (sp + 8 <= end) {
        val ssize = u32(bytes, sp + 4)
        val sbody = sp + 8
        val savail = math.min(ssize, (end - sbody).toLong).toInt
        if (fourcc(bytes, sp, "avih") && savail >= 40) {
          w = u32(bytes, sbody + 32).toInt
          h = u32(bytes, sbody + 36).toInt
        } else if (fourcc(bytes, sp, "LIST") && savail >= 4 &&
            fourcc(bytes, sbody, "strl")) {
          // first strl sub-chunk is strh; its body leads with fccType
          if (sbody + 16 <= end && fourcc(bytes, sbody + 4, "strh") &&
              fourcc(bytes, sbody + 12, "vids") && vidStream < 0) {
            vidStream = streamCount
            // walk THIS strl's sub-chunks to its strf (codec + palette)
            var tp = sbody + 4
            val tend = sbody + savail
            while (tp + 8 <= tend) {
              val tsize = u32(bytes, tp + 4)
              val tbody = tp + 8
              val tavail = math.min(tsize, (tend - tbody).toLong).toInt
              if (fourcc(bytes, tp, "strf") && tavail >= 40) readStrf(tbody, tavail)
              val tnext = tbody.toLong + tsize + (tsize & 1L)
              tp = if (tnext > tend) tend else tnext.toInt
            }
          }
          streamCount += 1
        }
        val snext = sbody.toLong + ssize + (ssize & 1L)
        sp = if (snext > end) end else snext.toInt
      }
    }

    // depth-bounded: `LIST rec ` interleave records hold frame chunks one
    // level down (spec: rec lists don't nest) — a hostile deeply-nested
    // payload must clamp, not recurse the stack away
    def walkMovi(start: Int, end: Int, depth: Int): Unit = {
      var sp = start
      while (sp + 8 <= end) {
        val ssize = u32(bytes, sp + 4)
        val sbody = sp + 8
        val savail = math.min(ssize, (end - sbody).toLong).toInt
        if (fourcc(bytes, sp, "LIST") && savail >= 4 &&
            fourcc(bytes, sbody, "rec ") && depth < 1) {
          walkMovi(sbody + 4, sbody + savail, depth + 1)
        } else if (isFrameChunk(bytes, sp, vidStream) && savail > 0) {
          frames += ((sbody, savail))
        }
        val snext = sbody.toLong + ssize + (ssize & 1L)
        sp = if (snext > end) end else snext.toInt
      }
    }

    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4)
      val body = pos + 8
      val avail = math.min(size, (bytes.length - body).toLong).toInt
      if (fourcc(bytes, pos, "LIST") && avail >= 4) {
        if (fourcc(bytes, body, "hdrl")) walkHdrl(body + 4, body + avail)
        else if (fourcc(bytes, body, "movi")) walkMovi(body + 4, body + avail, 0)
      }
      val next = body.toLong + size + (size & 1L)
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    val fs = frames.result()
    if (w <= 0 || h <= 0 || fs.isEmpty) None
    else Some(Parsed(w, h, fs, compression, palette, bitCount, topDown))
  }

  /** Decompression-bomb bound for the RLE8 canvas: a few-hundred-byte
    * payload can CLAIM any avih geometry, and the ARGB canvas (plus each
    * snapshot copy) costs 4·w·h bytes — cap total pixels, like [[Gif]]. */
  private def rleCanvasOk(p: Parsed): Boolean = p.w.toLong * p.h <= (1L << 22)

  private def rleCanvas(p: Parsed): Array[Int] = Array.fill(p.w * p.h)(0xff000000)

  private def canvasImage(canvas: Array[Int], w: Int, h: Int): BufferedImage =
    ImageOps.toImage(canvas.clone(), w, h)

  /** One uncompressed BI_RGB frame: 24-bit BGR triplets or 8-bit palette
    * indices, rows padded to 4-byte stride, BOTTOM-UP unless the strf
    * declared a negative height. A chunk smaller than the full raster
    * classifies (null) — a partial DIB frame has no defined content. */
  private def decodeDib(bytes: Array[Byte], off: Int, len: Int, p: Parsed): BufferedImage = {
    if (!rleCanvasOk(p)) return null // claimed-geometry bomb bound
    val bpp = p.bitCount / 8
    val stride = (p.w * bpp + 3) & ~3
    if (len < stride * p.h) return null
    val px = new Array[Int](p.w * p.h)
    var y = 0
    while (y < p.h) {
      val srcRow = off + stride * (if (p.topDown) y else p.h - 1 - y)
      var x = 0
      while (x < p.w) {
        px(y * p.w + x) =
          if (bpp == 3) { // BGR on disk
            val b = bytes(srcRow + 3 * x) & 0xff
            val g = bytes(srcRow + 3 * x + 1) & 0xff
            val r = bytes(srcRow + 3 * x + 2) & 0xff
            0xff000000 | (r << 16) | (g << 8) | b
          } else p.palette(bytes(srcRow + x) & 0xff)
        x += 1
      }
      y += 1
    }
    ImageOps.toImage(px, p.w, p.h)
  }

  /** Decode frame `idx`. Uncompressed DIB and MJPEG streams decode the
    * one chunk standalone (MJPEG through the JDK's real JPEG codec; null
    * if undecodable — the registry's null-decode contract). Inter-frame
    * RLE8 streams composite chunks 0..idx sequentially (O(idx) by the
    * codec's nature — use [[sampleFramesIndexed]] for multi-frame access,
    * it pays the walk once). */
  def frame(bytes: Array[Byte], p: Parsed, idx: Int): BufferedImage =
    if (p.isRle8) {
      if (!rleCanvasOk(p)) return null
      val canvas = rleCanvas(p)
      (0 to idx).foreach { k =>
        val (off, len) = p.frames(k)
        Rle8.applyChunk(bytes, off, len, canvas, p.w, p.h, p.palette)
      }
      canvasImage(canvas, p.w, p.h)
    } else if (p.isDib) {
      val (off, len) = p.frames(idx)
      decodeDib(bytes, off, len, p)
    } else {
      val (off, len) = p.frames(idx)
      ImageOps.decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
    }

  def decodeFirstFrame(bytes: Array[Byte]): BufferedImage =
    parse(bytes) match {
      case Some(p) if p.frameCount > 0 => frame(bytes, p, 0)
      case _                           => null
    }

  /** Evenly-spaced sample of up to `n` distinct frames with SOURCE indices
    * — the same floor-spaced decimation rule as
    * [[Y4m.sampleFramesIndexed]]. MJPEG frames whose JPEG payload fails to
    * decode are dropped (classify, never throw); inter-frame RLE8 streams
    * walk chunks 0..max(sampled) sequentially onto one canvas (cumulative
    * state is inherent to a delta codec — same discipline as [[Gif]]) and
    * snapshot at the sampled indices. */
  def sampleFramesIndexed(bytes: Array[Byte], n: Int): Seq[(Int, BufferedImage)] =
    parse(bytes) match {
      case Some(p) if p.frameCount > 0 && n > 0 && p.isRle8 =>
        if (!rleCanvasOk(p)) return Seq.empty
        val m = p.frameCount
        val wanted = VideoContainers.floorSpacedIndices(m, n).toSet
        val canvas = rleCanvas(p)
        val out = Seq.newBuilder[(Int, BufferedImage)]
        var i = 0
        val maxIdx = wanted.max
        while (i <= maxIdx) {
          val (off, len) = p.frames(i)
          Rle8.applyChunk(bytes, off, len, canvas, p.w, p.h, p.palette)
          if (wanted.contains(i)) out += ((i, canvasImage(canvas, p.w, p.h)))
          i += 1
        }
        out.result()
      case Some(p) if p.frameCount > 0 && n > 0 =>
        VideoContainers.floorSpacedIndices(p.frameCount, n).flatMap(idx =>
          Option(frame(bytes, p, idx)).map(img => (idx, img)))
      case _ => Seq.empty
    }

  /** MJPEG/AVI encode (the inverse surface): each frame JPEG-encoded via
    * the JDK codec into a minimal spec-complete container — avih + one
    * vids/MJPG strl + movi. All frames must share the first frame's
    * dimensions (the AVI contract: one video stream, fixed geometry). */
  def encodeMjpeg(framesIn: Seq[BufferedImage], fps: Int = 25): Array[Byte] = {
    require(framesIn.nonEmpty, "MJPEG container needs at least one frame")
    val w = framesIn.head.getWidth; val h = framesIn.head.getHeight
    require(framesIn.forall(f => f.getWidth == w && f.getHeight == h),
      "all MJPEG frames must share one geometry")
    writeAvi(w, h, fps, "MJPG", bitCount = 24, compression = 0x47504A4DL /* 'MJPG' */,
      palette = null, chunks = framesIn.map(ImageOps.encode(_, "jpg")),
      firstIsKeyframe = false)
  }

  /** Inter-frame RLE8/AVI encode: raw opcode chunks ([[Rle8.opFull]]/
    * [[Rle8.opPatch]] or hand-assembled hostile streams) into a
    * spec-complete container — vids/MRLE strl, 8-bit BITMAPINFOHEADER
    * with biCompression=1 and the color table, frame 0 tagged `00db`
    * (keyframe) and delta frames `00dc`. */
  def encodeRle8(w: Int, h: Int, palette: Array[Int], frameOps: Seq[Array[Byte]],
      fps: Int = 25): Array[Byte] = {
    require(frameOps.nonEmpty, "RLE8 container needs at least one frame")
    require(palette != null && palette.length <= 256, "palette: up to 256 ARGB entries")
    writeAvi(w, h, fps, "MRLE", bitCount = 8, compression = BiRle8,
      palette = palette, chunks = frameOps, firstIsKeyframe = true)
  }

  /** Uncompressed 24-bit BI_RGB/AVI encode: frames as raw BGR rasters,
    * rows padded to 4-byte stride, stored bottom-up (or top-down with the
    * negative-biHeight strf when `topDown`). */
  def encodeDib24(framesIn: Seq[BufferedImage], topDown: Boolean = false,
      fps: Int = 25): Array[Byte] = {
    require(framesIn.nonEmpty, "DIB container needs at least one frame")
    val w = framesIn.head.getWidth; val h = framesIn.head.getHeight
    require(framesIn.forall(f => f.getWidth == w && f.getHeight == h),
      "all DIB frames must share one geometry")
    val stride = (w * 3 + 3) & ~3
    val chunks = framesIn.map { img =>
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val raster = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val dstRow = stride * (if (topDown) y else h - 1 - y)
        var x = 0
        while (x < w) {
          val p = px(y * w + x)
          raster(dstRow + 3 * x) = (p & 0xff).toByte // B
          raster(dstRow + 3 * x + 1) = ((p >> 8) & 0xff).toByte // G
          raster(dstRow + 3 * x + 2) = ((p >> 16) & 0xff).toByte // R
          x += 1
        }
        y += 1
      }
      raster
    }
    writeAvi(w, h, fps, "DIB ", bitCount = 24, compression = 0L,
      palette = null, chunks = chunks, firstIsKeyframe = true,
      strfTopDown = topDown)
  }

  /** Uncompressed 8-bit paletted BI_RGB/AVI encode: frames as raw index
    * rasters (row-major, top-left origin — this writer lays them
    * bottom-up on disk), palette in the strf color table. */
  def encodeDib8(w: Int, h: Int, palette: Array[Int],
      indexFrames: Seq[Array[Byte]], fps: Int = 25): Array[Byte] = {
    require(indexFrames.nonEmpty, "DIB container needs at least one frame")
    require(palette != null && palette.length <= 256, "palette: up to 256 ARGB entries")
    require(indexFrames.forall(_.length == w * h), "index rasters must match geometry")
    val stride = (w + 3) & ~3
    val chunks = indexFrames.map { idx =>
      val raster = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        System.arraycopy(idx, y * w, raster, stride * (h - 1 - y), w)
        y += 1
      }
      raster
    }
    writeAvi(w, h, fps, "DIB ", bitCount = 8, compression = 0L,
      palette = palette, chunks = chunks, firstIsKeyframe = true)
  }

  private def writeAvi(w: Int, h: Int, fps: Int, handler: String, bitCount: Int,
      compression: Long, palette: Array[Int], chunks: Seq[Array[Byte]],
      firstIsKeyframe: Boolean, strfTopDown: Boolean = false): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    val palBytes = if (palette == null) 0 else 4 * palette.length
    val bb = new Riff.Writer
    // strh(56) + strf(40 + palette) inside strl; avih(56); sizes per spec
    val strfSize = 40 + palBytes
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + chunks.map(c => 8 + c.length + (c.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    bb.ascii("RIFF"); bb.u32(riffSize.toLong); bb.ascii("AVI ")
    bb.ascii("LIST"); bb.u32(hdrlSize.toLong); bb.ascii("hdrl")
    bb.ascii("avih"); bb.u32(56L)
    bb.u32(1000000L / fps); bb.u32(0L); bb.u32(0L)
    bb.u32(0L) // dwFlags: no AVIF_HASINDEX — this writer emits no idx1 chunk
    bb.u32(chunks.length.toLong); bb.u32(0L); bb.u32(1L); bb.u32(0L)
    bb.u32(w.toLong); bb.u32(h.toLong); (0 until 4).foreach(_ => bb.u32(0L))
    bb.ascii("LIST"); bb.u32(strlSize.toLong); bb.ascii("strl")
    bb.ascii("strh"); bb.u32(56L)
    bb.ascii("vids"); bb.ascii(handler)
    bb.u32(0L); bb.u16(0); bb.u16(0) // flags, priority, language
    bb.u32(0L); bb.u32(1L); bb.u32(fps.toLong) // initialFrames, scale, rate
    bb.u32(0L); bb.u32(chunks.length.toLong); bb.u32(0L) // start, length, bufSize
    bb.u32(0L); bb.u32(0L) // quality, sampleSize
    bb.u16(0); bb.u16(0); bb.u16(w); bb.u16(h) // rcFrame
    bb.ascii("strf"); bb.u32(strfSize.toLong) // BITMAPINFOHEADER [+ palette]
    bb.u32(40L); bb.u32(w.toLong)
    // DIB convention: negative biHeight = top-down row order
    bb.u32(if (strfTopDown) (-h).toLong & 0xffffffffL else h.toLong)
    bb.u16(1); bb.u16(bitCount)
    bb.u32(compression); bb.u32(w.toLong * h * (bitCount / 8))
    bb.u32(0L); bb.u32(0L)
    bb.u32(if (palette == null) 0L else palette.length.toLong) // biClrUsed
    bb.u32(0L)
    if (palette != null) palette.foreach { argb => // RGBQUAD: B, G, R, reserved
      bb.u32(((argb & 0xff).toLong) | (((argb >> 8) & 0xff).toLong << 8) |
        (((argb >> 16) & 0xff).toLong << 16))
    }
    bb.ascii("LIST"); bb.u32(moviSize.toLong); bb.ascii("movi")
    chunks.zipWithIndex.foreach { case (c, i) =>
      bb.ascii(if (firstIsKeyframe && i == 0) "00db" else "00dc")
      bb.u32(c.length.toLong); bb.bytes(c)
      if ((c.length & 1) == 1) bb.pad() // chunks pad to even
    }
    bb.result()
  }
}
