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
  *       LIST <u32> "strl"  ("strh" fccType=vids fccHandler=MJPG, "strf" …)
  *     LIST <u32> "movi"
  *       ( "00dc" | "00db" <u32 size> <one JPEG> [pad] )*
  *     [ "idx1" … ]
  * }}}
  * The walk matters: real AVIs carry JUNK/INFO/idx1 chunks and nested
  * lists — fixed offsets would misparse. All sizes advance in Long and
  * clamp to the payload end ([[Wav]]'s hostile-size discipline).
  *
  * Contract matches [[Y4m]]/[[ImageOps.decode]]: malformed, truncated or
  * null payloads yield None/empty — never a throw. A corrupt video row
  * must CLASSIFY, not abort the stage at 100 TB.
  */
object Avi {

  /** Container facts + per-frame chunk slices (offset,length) in stream
    * order. `w`/`h` come from avih; frames are the movi 00dc/00db chunks. */
  final case class Parsed(w: Int, h: Int, frames: IndexedSeq[(Int, Int)]) {
    def frameCount: Int = frames.length
  }

  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte
  /** Video frame chunk id: "##dc" (compressed) / "##db" (uncompressed-
    * tagged; MJPEG writers use both) for any stream number. */
  private def isFrameChunk(b: Array[Byte], i: Int): Boolean =
    b(i) >= '0' && b(i) <= '9' && b(i + 1) >= '0' && b(i + 1) <= '9' &&
      b(i + 2) == 'd'.toByte && (b(i + 3) == 'c'.toByte || b(i + 3) == 'b'.toByte)

  def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (bytes == null || bytes.length < 12) return None
    if (!fourcc(bytes, 0, "RIFF") || !fourcc(bytes, 8, "AVI ")) return None
    var w = -1; var h = -1
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4)
      val body = pos + 8
      val avail = math.min(size, (bytes.length - body).toLong).toInt
      if (fourcc(bytes, pos, "LIST") && avail >= 4) {
        if (fourcc(bytes, body, "hdrl")) {
          // sub-walk for avih (may itself precede nested strl LISTs)
          var sp = body + 4
          val end = body + avail
          while (sp + 8 <= end) {
            val ssize = u32(bytes, sp + 4)
            val sbody = sp + 8
            val savail = math.min(ssize, (end - sbody).toLong).toInt
            if (fourcc(bytes, sp, "avih") && savail >= 40) {
              w = u32(bytes, sbody + 32).toInt
              h = u32(bytes, sbody + 36).toInt
            }
            val snext = sbody.toLong + ssize + (ssize & 1L)
            sp = if (snext > end) end else snext.toInt
          }
        } else if (fourcc(bytes, body, "movi")) {
          var sp = body + 4
          val end = body + avail
          while (sp + 8 <= end) {
            val ssize = u32(bytes, sp + 4)
            val sbody = sp + 8
            val savail = math.min(ssize, (end - sbody).toLong).toInt
            if (isFrameChunk(bytes, sp) && savail > 0) frames += ((sbody, savail))
            val snext = sbody.toLong + ssize + (ssize & 1L)
            sp = if (snext > end) end else snext.toInt
          }
        }
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
    val w = framesIn.head.getWidth; val h = framesIn.head.getHeight
    require(framesIn.forall(f => f.getWidth == w && f.getHeight == h),
      "all MJPEG frames must share one geometry")
    val jpegs = framesIn.map(ImageOps.encode(_, "jpg"))
    val bb = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = (0 until s.length).foreach(i => bb.write(s.charAt(i)))
    def u32le(v: Long): Unit = (0 until 4).foreach(j => bb.write(((v >> (8 * j)) & 0xff).toInt))
    def u16le(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    // strh(56) + strf(40) inside strl; avih(56); sizes per spec
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    ascii("RIFF"); u32le(riffSize.toLong); ascii("AVI ")
    ascii("LIST"); u32le(hdrlSize.toLong); ascii("hdrl")
    ascii("avih"); u32le(56L)
    u32le(1000000L / fps); u32le(0L); u32le(0L); u32le(0x10L /*HASINDEX off, INTERLEAVED off; plain*/)
    u32le(jpegs.length.toLong); u32le(0L); u32le(1L); u32le(0L)
    u32le(w.toLong); u32le(h.toLong); (0 until 4).foreach(_ => u32le(0L))
    ascii("LIST"); u32le(strlSize.toLong); ascii("strl")
    ascii("strh"); u32le(56L)
    ascii("vids"); ascii("MJPG")
    u32le(0L); u16le(0); u16le(0) // flags, priority, language
    u32le(0L); u32le(1L); u32le(fps.toLong) // initialFrames, scale, rate
    u32le(0L); u32le(jpegs.length.toLong); u32le(0L) // start, length, bufSize
    u32le(0L); u32le(0L) // quality, sampleSize
    u16le(0); u16le(0); u16le(w); u16le(h) // rcFrame
    ascii("strf"); u32le(40L) // BITMAPINFOHEADER
    u32le(40L); u32le(w.toLong); u32le(h.toLong); u16le(1); u16le(24)
    ascii("MJPG"); u32le(w.toLong * h * 3); u32le(0L); u32le(0L); u32le(0L); u32le(0L)
    ascii("LIST"); u32le(moviSize.toLong); ascii("movi")
    jpegs.foreach { j =>
      ascii("00dc"); u32le(j.length.toLong); bb.write(j, 0, j.length)
      if ((j.length & 1) == 1) bb.write(0) // pad to even
    }
    bb.toByteArray
  }
}
