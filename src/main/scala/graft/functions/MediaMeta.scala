package graft.functions

import java.awt.image.BufferedImage

/** Single-pass media TRIAGE — the one call a 100 TB pipeline runs on
  * every fetched payload: sniff the container from CONTENT (never a
  * trusted column), route to the walker that owns it, and normalize the
  * result to one record of (kind, container, codec, dims, duration,
  * rate, channels). Composes the format family this module tree already
  * implements: [[Jpeg]]/[[Mp4]]/[[Mkv]]/[[Ogg]]/[[Mpeg]] metadata
  * walks, [[Wav]]/[[Flac]]/[[Aiff]]/[[Au]] audio features, and the
  * image/video decoders ([[Y4m]]/[[Avi]]/[[Gif]]/[[Apng]]/
  * [[AnimWebp]]/[[ImageOps]]). Animated GIF/APNG/WebP classify as
  * video; their stills as image. TGA is signature-less by design and
  * can only be reached by declared fmt (see [[Tga]]) — content triage
  * honestly reports it unknown.
  *
  * Never throws: unrecognized or corrupt payloads come back
  * kind="unknown". */
object MediaMeta {

  final case class Described(
      kind: String, // "image" | "video" | "audio" | "unknown"
      container: String,
      codec: String, // "" when unknown/not applicable
      width: Int, height: Int, // -1 when not applicable
      durationMs: Long, // -1 when not applicable
      sampleRate: Int, channels: Int) // -1 when not applicable

  private val Unknown = Described("unknown", "unknown", "", -1, -1, -1L, -1, -1)

  private def image(container: String, codec: String, img: BufferedImage): Described =
    Described("image", container, codec,
      if (img == null) -1 else img.getWidth,
      if (img == null) -1 else img.getHeight, -1L, -1, -1)

  private def wavCodec(audioFormat: Int): String = audioFormat match {
    case 1 => "pcm"
    case 2 => "ms_adpcm"
    case 6 => "g711_alaw"
    case 7 => "g711_ulaw"
    case 0x11 => "ima_adpcm"
    case f => s"fmt_$f"
  }

  private def audio(container: String, codec: String, f: Wav.Features): Described =
    Described("audio", container, codec, -1, -1,
      f.durationMs, f.sampleRate, f.channels)

  private def hasPrefix(b: Array[Byte], magic: String, at: Int = 0): Boolean =
    b.length >= at + magic.length && {
      var i = 0
      while (i < magic.length && b(at + i) == magic.charAt(i).toByte) i += 1
      i == magic.length
    }

  /** Triage a payload by content. */
  def describe(bytes: Array[Byte]): Described =
    try {
      if (bytes == null || bytes.length < 4) return Unknown

      if (Ogg.isOgg(bytes)) return Ogg.audioMeta(bytes) match {
        case Some(m) => Described("audio", "ogg", m.codec, -1, -1,
          m.durationMs, m.sampleRate, m.channels)
        case None => Unknown
      }

      if (Mkv.isMkv(bytes)) return Mkv.videoMeta(bytes) match {
        case Some(m) if m.videoCodec.nonEmpty => Described("video", m.docType,
          m.videoCodec, m.width, m.height, m.durationMs, m.sampleRate, m.channels)
        case Some(m) => Described("audio", m.docType, m.audioCodec, -1, -1,
          m.durationMs, m.sampleRate, m.channels)
        case None => Unknown
      }

      // AVIF/HEIC are ISO-BMFF files that are IMAGES — split by brand
      // BEFORE the movie walk or every modern still photo classifies as
      // a broken video
      if (Heif.isHeif(bytes)) return Heif.imageMeta(bytes) match {
        case Some(m) => Described("image", m.brand, m.codec,
          m.width, m.height, -1L, -1, -1)
        case None => Unknown
      }

      if (Mp4.isMp4(bytes)) return Mp4.videoMeta(bytes) match {
        case Some(m) => m.video match {
          case Some(v) => Described("video", "mp4", v.codec, v.width, v.height,
            m.durationMs, m.audio.map(_.sampleRate).getOrElse(-1),
            m.audio.map(_.channels).getOrElse(-1))
          case None => Described("audio", "mp4",
            m.audio.map(_.codec).getOrElse(""), -1, -1, m.durationMs,
            m.audio.map(_.sampleRate).getOrElse(-1),
            m.audio.map(_.channels).getOrElse(-1))
        }
        case None => Unknown
      }

      if (Jpeg.isJpeg(bytes)) return Jpeg.exifMeta(bytes) match {
        case Some(m) => Described("image", "jpeg", "jpeg", m.width, m.height,
          -1L, -1, -1)
        case None => Unknown
      }

      if (hasPrefix(bytes, "YUV4MPEG2")) {
        val first = Y4m.decodeFirstFrame(bytes)
        return Described("video", "y4m", "rawvideo",
          if (first == null) -1 else first.getWidth,
          if (first == null) -1 else first.getHeight, -1L, -1, -1)
      }

      if (Avi.isAvi(bytes)) {
        val first = Avi.decodeFirstFrame(bytes)
        return Described("video", "avi", "",
          if (first == null) -1 else first.getWidth,
          if (first == null) -1 else first.getHeight, -1L, -1, -1)
      }

      if (Gif.isGif(bytes)) {
        val frames = Gif.sampleFramesIndexed(bytes, 2)
        return if (frames.length > 1)
          Described("video", "gif", "gif", frames.head._2.getWidth,
            frames.head._2.getHeight, -1L, -1, -1)
        else image("gif", "gif", Gif.decodeFirstFrame(bytes))
      }

      if (Apng.isPng(bytes)) {
        if (Apng.isApng(bytes)) {
          val frames = Apng.sampleFramesIndexed(bytes, 1)
          return Described("video", "apng", "png",
            frames.headOption.map(_._2.getWidth).getOrElse(-1),
            frames.headOption.map(_._2.getHeight).getOrElse(-1), -1L, -1, -1)
        }
        return image("png", "png", ImageOps.decode(bytes))
      }

      if (hasPrefix(bytes, "RIFF") && hasPrefix(bytes, "WEBP", 8)) {
        if (AnimWebp.isAnimWebp(bytes)) {
          val frames = AnimWebp.sampleFramesIndexed(bytes, 1)
          return Described("video", "webp", "vp8l",
            frames.headOption.map(_._2.getWidth).getOrElse(-1),
            frames.headOption.map(_._2.getHeight).getOrElse(-1), -1L, -1, -1)
        }
        // still WebP: VP8L decodes here; lossy VP8 needs the stubbed codec
        return image("webp", "vp8l", ImageOps.decode(bytes))
      }

      if (hasPrefix(bytes, "qoif")) return image("qoi", "qoi", ImageOps.decode(bytes))

      if (bytes.length >= 6 && bytes(0) == 0 && bytes(1) == 0 &&
          bytes(2) == 1 && bytes(3) == 0)
        return image("ico", "ico", ImageOps.decode(bytes))

      // BMP/TIFF: the JDK ships both readers; triage just needs the sniff
      if (hasPrefix(bytes, "BM"))
        return image("bmp", "bmp", ImageOps.decode(bytes))
      if (bytes.length >= 4 &&
          ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
           (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42)))
        return image("tiff", "tiff", ImageOps.decode(bytes))

      // SVG: text, not magic — sniff the first element's local name
      if (Svg.isSvg(bytes)) return Svg.imageMeta(bytes) match {
        case Some(m) => Described("image", "svg", "svg", m.width, m.height,
          -1L, -1, -1)
        case None => Unknown
      }

      if (Flac.isFlac(bytes))
        return Flac.features(bytes).map(audio("flac", "flac", _)).getOrElse(Unknown)
      if (Aiff.isAiff(bytes))
        return Aiff.features(bytes)
          .map(f => audio("aiff", wavCodec(f.audioFormat), f)).getOrElse(Unknown)
      if (Au.isAu(bytes))
        return Au.features(bytes)
          .map(f => audio("au", wavCodec(f.audioFormat), f)).getOrElse(Unknown)
      if (hasPrefix(bytes, "RIFF") && hasPrefix(bytes, "WAVE", 8))
        return Wav.features(bytes)
          .map(f => audio("wav", wavCodec(f.audioFormat), f)).getOrElse(Unknown)

      // DOCUMENT binaries — distinct magics, so they can sit after the
      // media families without shadowing anything. codec carries the
      // per-format discriminator (pdf/warc version; docx vs bare zip).
      if (hasPrefix(bytes, "%PDF-")) return Pdf.docMeta(bytes) match {
        case Some(m) => Described("document", "pdf", m.version, -1, -1, -1L, -1, -1)
        case None => Unknown
      }
      if (Warc.isWarc(bytes)) return Warc.archiveMeta(bytes) match {
        case Some(m) => Described("document", "warc", m.version, -1, -1, -1L, -1, -1)
        case None => Unknown
      }
      if (hasPrefix(bytes, "PK\u0003\u0004")) return Zip.docxMeta(bytes) match {
        case Some(_) => Described("document", "docx", "wordprocessingml",
          -1, -1, -1L, -1, -1)
        case None =>
          // a real zip that isn't a docx is still a document container
          if (Zip.entries(bytes).nonEmpty)
            Described("document", "zip", "", -1, -1, -1L, -1, -1)
          else Unknown
      }

      if (Tar.isTar(bytes) && Tar.entries(bytes).isDefined)
        return Described("document", "tar", "", -1, -1, -1L, -1, -1)

      if (Ivf.isIvf(bytes)) return Ivf.videoMeta(bytes) match {
        case Some(m) =>
          // bitstream dims are the truth when the container disagrees
          // (post-transcode headers lie in the wild)
          val (w, h) = Vp9.fromIvf(bytes).map(v => (v._1.width, v._1.height))
            .orElse(Av1.fromIvf(bytes).map(a => (a._1.width, a._1.height)))
            .getOrElse((m.width, m.height))
          Described("video", "ivf", m.codec, w, h, m.durationMs, -1, -1)
        case None => Unknown
      }

      // raw Annex-B H.264: the 4-byte start code (the 3-byte form alone
      // would shadow ICO's 00 00 01 00 magic, so require the long form)
      if (bytes.length >= 5 && bytes(0) == 0 && bytes(1) == 0 &&
          bytes(2) == 0 && bytes(3) == 1 && (bytes(4) & 0x80) == 0) {
        H264.spsMeta(bytes) match {
          case Some(m) => return Described("video", "h264", "avc",
            m.width, m.height, -1L, -1, -1)
          case None => // fall through: not a parseable AVC stream
        }
      }

      // ADTS/AAC before MP3: both are magic-less 0xFFF sync chains, but
      // ADTS carries layer bits 00 where MPEG audio never does, so the
      // two walks are mutually exclusive by construction
      Aac.audioMeta(bytes) match {
        case Some(m) => return Described("audio", "adts", "aac_" + m.profile,
          -1, -1, m.durationMs, m.sampleRate, m.channels)
        case None =>
      }

      // MP3 has no magic: the chained-frame walk self-validates (ID3v2
      // or a syncing header that CHAINS), so it goes last
      Mpeg.audioMeta(bytes) match {
        case Some(m) => Described("audio", "mpeg", s"mp${m.layer}", -1, -1,
          m.durationMs, m.sampleRate, m.channels)
        case None => Unknown
      }
    } catch { case scala.util.control.NonFatal(_) => Unknown }
}
