package graft.functions

/** Matroska/WebM (EBML) METADATA — doc type, movie duration, per-track
  * codec IDs, video dimensions, audio rate/channels — by walking the
  * public EBML grammar (RFC 8794: length-prefixed variable-size element
  * IDs and sizes, unknown-size elements) and the published Matroska
  * element IDs (EBML header/DocType, Segment > Info
  * {TimestampScale, Duration} and Tracks > TrackEntry
  * {TrackType, CodecID, Video{PixelWidth,PixelHeight},
  * Audio{SamplingFrequency,Channels}}). WebM is the web's royalty-free
  * video container (VP8/VP9/AV1 + Vorbis/Opus); as with MP4 (q53) this
  * is the honest container half — block DECODE needs those codecs and
  * stays with the clearly-marked stubs.
  *
  *  - IDs keep their marker bits (1-4 bytes); sizes strip theirs
  *    (1-8 bytes); an all-ones size is "unknown" — tolerated for
  *    Segment and Cluster (live-muxed files), malformed elsewhere
  *  - every walk is bounded by the enclosing element AND a global
  *    element budget; declared sizes past the buffer truncate the walk
  *    rather than read out of bounds
  *
  * Malformed/truncated payloads classify (None), never throw. */
object Mkv {

  final case class Meta(
      docType: String, // "webm" | "matroska"
      durationMs: Long,
      videoCodec: String, width: Int, height: Int,
      audioCodec: String, sampleRate: Int, channels: Int)

  private val MaxElements = 4096

  def isMkv(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (b(0) & 0xff) == 0x1a &&
      (b(1) & 0xff) == 0x45 && (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

  // element IDs (with marker bits, as conventionally written)
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL
  private val IdAudio = 0xe1L
  private val IdSamplingFreq = 0xb5L
  private val IdChannels = 0x9fL
  private val IdCluster = 0x1f43b675L

  private val Unknown = -2L

  private final class Walker(val b: Array[Byte]) {
    var budget: Int = MaxElements

    /** EBML ID at p: (id incl. marker, width) or null on malformed. */
    def readId(p: Int, end: Int): (Long, Int) = {
      if (p >= end) return null
      val first = b(p) & 0xff
      val w = Integer.numberOfLeadingZeros(first) - 24 + 1
      if (first == 0 || w > 4 || p + w > end) return null
      var v = first.toLong
      var i = 1
      while (i < w) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      (v, w)
    }

    /** EBML size at p: (value, width); value == Unknown for all-ones. */
    def readSize(p: Int, end: Int): (Long, Int) = {
      if (p >= end) return null
      val first = b(p) & 0xff
      val w = Integer.numberOfLeadingZeros(first) - 24 + 1
      if (first == 0 || w > 8 || p + w > end) return null
      var v = (first & (0xff >>> w)).toLong
      var allOnes = (first & (0xff >>> w)) == (0xff >>> w)
      var i = 1
      while (i < w) {
        val x = b(p + i) & 0xff
        if (x != 0xff) allOnes = false
        v = (v << 8) | x
        i += 1
      }
      (if (allOnes) Unknown else v, w)
    }

    /** Walk children of [start,end): f(id, payStart, payEnd). Unknown
      * sizes run to `end` when `id` is a tolerated master (Segment /
      * Cluster), else stop. Stops at the first malformed header. */
    def children(start: Int, end: Int)(f: (Long, Int, Int) => Unit): Unit = {
      var p = start
      var ok = true
      while (ok && p < end && budget > 0) {
        budget -= 1
        val id = readId(p, end)
        if (id == null) return
        val sz = readSize(p + id._2, end)
        if (sz == null) return
        val pay = p + id._2 + sz._2
        if (sz._1 == Unknown) {
          if (id._1 == IdSegment || id._1 == IdCluster) { f(id._1, pay, end); return }
          else return // unknown size on a non-streamable element
        }
        if (sz._1 < 0 || sz._1 > end - pay) ok = false // lying size: stop
        else {
          f(id._1, pay, pay + sz._1.toInt)
          p = pay + sz._1.toInt
        }
      }
    }

    def uint(s: Int, e: Int): Long = {
      if (e - s > 8 || e < s) return -1L
      var v = 0L
      var i = s
      while (i < e) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }

    def float(s: Int, e: Int): Double = (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(s, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(s, e))
      case 0 => 0.0
      case _ => Double.NaN
    }

    def str(s: Int, e: Int): String = {
      if (e < s || e - s > 4096) return ""
      var n = e - s
      while (n > 0 && b(s + n - 1) == 0) n -= 1 // NUL padding allowed
      new String(b, s, n, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Container metadata, or None when the payload is not EBML/Matroska. */
  def videoMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isMkv(bytes)) return None
      val w = new Walker(bytes)
      var docType: String = null
      var tsScale = 1000000L // Matroska default: 1 ms
      var duration = Double.NaN
      var videoCodec = ""; var width = 0; var height = 0
      var audioCodec = ""; var rate = 0; var channels = 0

      def parseTrackEntry(s: Int, e: Int): Unit = {
        var typ = -1L; var codec = ""
        var pw = 0L; var ph = 0L; var freq = 0.0; var ch = 0L
        w.children(s, e) { (id, cs, ce) =>
          id match {
            case IdTrackType => typ = w.uint(cs, ce)
            case IdCodecId => codec = w.str(cs, ce)
            case IdVideo => w.children(cs, ce) { (vid, vs, ve) =>
              vid match {
                case IdPixelWidth => pw = w.uint(vs, ve)
                case IdPixelHeight => ph = w.uint(vs, ve)
                case _ => ()
              }
            }
            case IdAudio => w.children(cs, ce) { (aid, as_, ae) =>
              aid match {
                case IdSamplingFreq => freq = w.float(as_, ae)
                case IdChannels => ch = w.uint(as_, ae)
                case _ => ()
              }
            }
            case _ => ()
          }
        }
        if (typ == 1 && videoCodec.isEmpty) {
          videoCodec = codec; width = pw.toInt; height = ph.toInt
        } else if (typ == 2 && audioCodec.isEmpty) {
          audioCodec = codec
          rate = if (freq.isNaN) 0 else math.round(freq).toInt
          channels = ch.toInt
        }
      }

      w.children(0, bytes.length) { (id, s, e) =>
        id match {
          case IdEbml =>
            w.children(s, e) { (hid, hs, he) =>
              if (hid == IdDocType) docType = w.str(hs, he)
            }
          case IdSegment if docType != null =>
            w.children(s, e) { (sid, ss, se) =>
              sid match {
                case IdInfo => w.children(ss, se) { (iid, is, ie) =>
                  iid match {
                    case IdTimestampScale =>
                      val v = w.uint(is, ie); if (v > 0) tsScale = v
                    case IdDuration => duration = w.float(is, ie)
                    case _ => ()
                  }
                }
                case IdTracks => w.children(ss, se) { (tid, ts, te) =>
                  if (tid == IdTrackEntry) parseTrackEntry(ts, te)
                }
                case _ => () // Cluster/Cues/SeekHead: skipped
              }
            }
          case _ => ()
        }
      }
      if (docType == null || (videoCodec.isEmpty && audioCodec.isEmpty)) None
      else {
        val durMs =
          if (duration.isNaN || duration < 0) -1L
          else math.round(duration * tsScale / 1e6)
        Some(Meta(docType, durMs, videoCodec, width, height,
          audioCodec, rate, channels))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // =====================================================================
  // Fixture-side encoder: a real, minimal EBML writer — valid element
  // trees with an empty Cluster standing in for block data (the walk
  // never reads blocks; codec decode is exactly what stays stubbed).

  private def sizeBytes(n: Long): Array[Byte] = {
    // minimal-width EBML size (avoiding the all-ones "unknown" pattern)
    var w = 1
    while (w <= 8 && (n >= (1L << (7 * w)) - 1)) w += 1
    require(w <= 8, s"size too large: $n")
    val out = new Array[Byte](w)
    var v = n | (1L << (7 * w))
    var i = w - 1
    while (i >= 0) { out(i) = (v & 0xff).toByte; v >>= 8; i -= 1 }
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    var w = 1
    while (w < 4 && (id >> (8 * w)) != 0) w += 1
    val out = new Array[Byte](w)
    var v = id
    var i = w - 1
    while (i >= 0) { out(i) = (v & 0xff).toByte; v >>= 8; i -= 1 }
    out
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ sizeBytes(payload.length.toLong) ++ payload

  private def uintEl(id: Long, v: Long): Array[Byte] = {
    var w = 1
    while (w < 8 && (v >>> (8 * w)) != 0) w += 1
    val p = new Array[Byte](w)
    var x = v; var i = w - 1
    while (i >= 0) { p(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    el(id, p)
  }

  private def floatEl(id: Long, v: Double, wide: Boolean): Array[Byte] =
    if (wide) {
      val bits = java.lang.Double.doubleToLongBits(v)
      el(id, Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte))
    } else {
      val bits = java.lang.Float.floatToIntBits(v.toFloat)
      el(id, Array.tabulate(4)(i => ((bits >> (8 * (3 - i))) & 0xff).toByte))
    }

  private def strEl(id: Long, s: String): Array[Byte] =
    el(id, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  final case class VideoTrack(codec: String, w: Int, h: Int)
  final case class AudioTrack(codec: String, rate: Int, channels: Int)

  /** Encode a minimal-but-real Matroska/WebM file. `unknownSegmentSize`
    * writes the Segment with the all-ones size (live-muxed shape);
    * `wideDuration` uses the 8-byte float form. */
  def encode(docType: String, durationMs: Double,
      video: Option[VideoTrack], audio: Option[AudioTrack],
      unknownSegmentSize: Boolean = false, wideDuration: Boolean = false,
      timestampScale: Long = 1000000L): Array[Byte] = {
    require(video.nonEmpty || audio.nonEmpty)
    val header = el(IdEbml,
      uintEl(0x4286L, 1) ++ uintEl(0x42f7L, 1) ++ // EBMLVersion, ReadVersion
        uintEl(0x42f2L, 4) ++ uintEl(0x42f3L, 8) ++ // MaxIDLength, MaxSizeLength
        strEl(IdDocType, docType) ++
        uintEl(0x4287L, 4) ++ uintEl(0x4285L, 2)) // DocTypeVersion, ReadVersion
    val info = el(IdInfo,
      uintEl(IdTimestampScale, timestampScale) ++
        floatEl(IdDuration, durationMs * 1000000.0 / timestampScale, wideDuration))
    var trackNum = 0
    def entry(typ: Int, codec: String, extra: Array[Byte]): Array[Byte] = {
      trackNum += 1
      el(IdTrackEntry,
        uintEl(0xd7L, trackNum.toLong) ++ uintEl(0x73c5L, trackNum.toLong) ++ // num, UID
          uintEl(IdTrackType, typ.toLong) ++ strEl(IdCodecId, codec) ++ extra)
    }
    val tracks = el(IdTracks,
      video.map(v => entry(1, v.codec,
        el(IdVideo, uintEl(IdPixelWidth, v.w.toLong) ++ uintEl(IdPixelHeight, v.h.toLong))))
        .getOrElse(Array.emptyByteArray) ++
        audio.map(a => entry(2, a.codec,
          el(IdAudio, floatEl(IdSamplingFreq, a.rate.toDouble, wide = false) ++
            uintEl(IdChannels, a.channels.toLong))))
          .getOrElse(Array.emptyByteArray))
    val cluster = el(IdCluster, uintEl(0xe7L, 0)) // Timestamp 0, no blocks
    val segPayload = info ++ tracks ++ cluster
    val segment =
      if (unknownSegmentSize)
        idBytes(IdSegment) ++ Array.fill(8)(0xffL).zipWithIndex.map { case (_, i) =>
          (if (i == 0) 0x01 else 0xff).toByte
        } ++ segPayload
      else el(IdSegment, segPayload)
    header ++ segment
  }
}
