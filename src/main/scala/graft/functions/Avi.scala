package graft.functions

import java.awt.image.BufferedImage

/** Real COMPRESSED-video decode: Motion-JPEG inside the RIFF/AVI container
  * (the oldest interchange format still in the wild — OpenDML/AVI 1.0,
  * Microsoft 1992 public spec). Every frame of an MJPEG stream is a
  * standalone baseline JPEG, and the JDK ships a real JPEG codec
  * (ImageIO), so MJPEG/AVI decodes end-to-end in pure JVM: a RIFF list
  * walk to the `movi` frame chunks, then the JDK's Huffman+DCT decode per
  * frame. Only inter-frame codecs (H.264/VP9/…) stay behind the
  * clearly-marked stub — those genuinely need codec libraries this
  * container doesn't ship.
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
    * movi `##dc`/`##db` chunks. */
  final case class Parsed(w: Int, h: Int, frames: IndexedSeq[(Int, Int)]) {
    def frameCount: Int = frames.length
  }

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
    val frames = IndexedSeq.newBuilder[(Int, Int)]

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
              fourcc(bytes, sbody + 12, "vids") && vidStream < 0)
            vidStream = streamCount
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
    if (w <= 0 || h <= 0 || fs.isEmpty) None else Some(Parsed(w, h, fs))
  }

  /** Decode frame `idx` through the JDK's real JPEG codec; null if the
    * chunk isn't decodable (the registry's null-decode contract). */
  def frame(bytes: Array[Byte], p: Parsed, idx: Int): BufferedImage = {
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
    * [[Y4m.sampleFramesIndexed]]. Frames whose JPEG payload fails to
    * decode are dropped (classify, never throw). */
  def sampleFramesIndexed(bytes: Array[Byte], n: Int): Seq[(Int, BufferedImage)] =
    parse(bytes) match {
      case Some(p) if p.frameCount > 0 && n > 0 =>
        val m = p.frameCount
        val k = math.min(n, m)
        (0 until k).flatMap { j =>
          val idx = (j.toLong * m / k).toInt
          Option(frame(bytes, p, idx)).map(img => (idx, img))
        }
      case _ => Seq.empty
    }

  /** MJPEG/AVI encode (the inverse surface): each frame JPEG-encoded via
    * the JDK codec into a minimal spec-complete container — avih + one
    * vids/MJPG strl + movi. All frames must share the first frame's
    * dimensions (the AVI contract: one video stream, fixed geometry). */
  def encodeMjpeg(framesIn: Seq[BufferedImage], fps: Int = 25): Array[Byte] = {
    require(framesIn.nonEmpty, "MJPEG container needs at least one frame")
    require(fps > 0, s"fps must be positive, got $fps")
    val w = framesIn.head.getWidth; val h = framesIn.head.getHeight
    require(framesIn.forall(f => f.getWidth == w && f.getHeight == h),
      "all MJPEG frames must share one geometry")
    val jpegs = framesIn.map(ImageOps.encode(_, "jpg"))
    val bb = new Riff.Writer
    // strh(56) + strf(40) inside strl; avih(56); sizes per spec
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    bb.ascii("RIFF"); bb.u32(riffSize.toLong); bb.ascii("AVI ")
    bb.ascii("LIST"); bb.u32(hdrlSize.toLong); bb.ascii("hdrl")
    bb.ascii("avih"); bb.u32(56L)
    bb.u32(1000000L / fps); bb.u32(0L); bb.u32(0L)
    bb.u32(0L) // dwFlags: no AVIF_HASINDEX — this writer emits no idx1 chunk
    bb.u32(jpegs.length.toLong); bb.u32(0L); bb.u32(1L); bb.u32(0L)
    bb.u32(w.toLong); bb.u32(h.toLong); (0 until 4).foreach(_ => bb.u32(0L))
    bb.ascii("LIST"); bb.u32(strlSize.toLong); bb.ascii("strl")
    bb.ascii("strh"); bb.u32(56L)
    bb.ascii("vids"); bb.ascii("MJPG")
    bb.u32(0L); bb.u16(0); bb.u16(0) // flags, priority, language
    bb.u32(0L); bb.u32(1L); bb.u32(fps.toLong) // initialFrames, scale, rate
    bb.u32(0L); bb.u32(jpegs.length.toLong); bb.u32(0L) // start, length, bufSize
    bb.u32(0L); bb.u32(0L) // quality, sampleSize
    bb.u16(0); bb.u16(0); bb.u16(w); bb.u16(h) // rcFrame
    bb.ascii("strf"); bb.u32(40L) // BITMAPINFOHEADER
    bb.u32(40L); bb.u32(w.toLong); bb.u32(h.toLong); bb.u16(1); bb.u16(24)
    bb.ascii("MJPG"); bb.u32(w.toLong * h * 3)
    bb.u32(0L); bb.u32(0L); bb.u32(0L); bb.u32(0L)
    bb.ascii("LIST"); bb.u32(moviSize.toLong); bb.ascii("movi")
    jpegs.foreach { j =>
      bb.ascii("00dc"); bb.u32(j.length.toLong); bb.bytes(j)
      if ((j.length & 1) == 1) bb.pad() // chunks pad to even
    }
    bb.result()
  }
}
