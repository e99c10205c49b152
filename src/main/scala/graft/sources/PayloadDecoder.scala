package graft.sources

import java.awt.image.BufferedImage

import graft.functions.ImageOps

/** X1 — payload decoder plugin registry (the reference's converter plugin
  * system, `src/converters/base.py:10-27` + `__init__.py:15-52`, with the
  * payload swapped from markdown converters to image decoders per the
  * graft cell). Decoders run per-row inside the fetch/validate operators.
  */
trait PayloadDecoder extends Serializable {
  def fmt: String
  def lossless: Boolean
  def decode(bytes: Array[Byte]): BufferedImage
  def encode(img: BufferedImage): Array[Byte]

  /** Per-row J7 invariant for this format: exact pixels if lossless,
    * PSNR ≥ 40 dB otherwise. */
  def valid(psnrDb: Double): Boolean =
    if (lossless) psnrDb == 999.0 else psnrDb >= 40.0
}

final class PngDecoder extends PayloadDecoder {
  override val fmt = "png"
  override val lossless = true
  override def decode(bytes: Array[Byte]): BufferedImage = ImageOps.decode(bytes)
  override def encode(img: BufferedImage): Array[Byte] = ImageOps.encode(img, "png")
}

final class JpgDecoder extends PayloadDecoder {
  override val fmt = "jpg"
  override val lossless = false
  override def decode(bytes: Array[Byte]): BufferedImage = ImageOps.decode(bytes)
  override def encode(img: BufferedImage): Array[Byte] = ImageOps.encode(img, "jpg")
}

/** Uncompressed video (YUV4MPEG2): REAL decode — Y4M is header text + raw
  * planar YCbCr, no codec needed, so [[graft.functions.Y4m]] parses it in
  * pure JVM integer math (frame 0 here; frame sampling via
  * [[graft.functions.Y4m.sampleFrames]]). Driver-gated by q35 against a
  * closed-form DuckDB oracle. */
final class Y4mDecoder extends PayloadDecoder {
  override val fmt = "y4m"
  override val lossless = false // BT.601 integer round-trip: ±2/channel ≫ 40 dB
  override def decode(bytes: Array[Byte]): BufferedImage =
    graft.functions.Y4m.decodeFirstFrame(bytes)
  override def encode(img: BufferedImage): Array[Byte] =
    graft.functions.Y4m.encodeFrame(img)
}

/** RIFF/AVI video: REAL compressed-video decode for both codecs the
  * container walk recognizes — Motion-JPEG (every frame a standalone
  * baseline JPEG through the JDK's own Huffman/DCT codec; driver-gated by
  * q38) and Microsoft RLE8 (biCompression=1 — a genuinely INTER-FRAME
  * delta codec composited by [[graft.functions.Rle8]]; driver-gated by
  * q43). Dispatch is by strf content inside [[graft.functions.Avi]];
  * frame sampling via [[graft.functions.Avi.sampleFramesIndexed]]. */
final class AviMjpegDecoder extends PayloadDecoder {
  override val fmt = "avi"
  override val lossless = false // JPEG per frame: lossy, ≥40 dB gate
  override def decode(bytes: Array[Byte]): BufferedImage =
    graft.functions.Avi.decodeFirstFrame(bytes)
  override def encode(img: BufferedImage): Array[Byte] =
    graft.functions.Avi.encodeMjpeg(Seq(img))
}

/** Animated GIF: REAL decode — LZW + palette via the JDK codec with
  * patch/disposal compositing in [[graft.functions.Gif]] (frame sampling
  * via [[graft.functions.Gif.sampleFramesIndexed]]). Declares LOSSY:
  * the encode side palette-quantizes to ≤256 colors, so an arbitrary
  * image does not round-trip exactly (in-palette colors do — the q41
  * fixtures ride that). Driver-gated by q41. */
final class GifDecoder extends PayloadDecoder {
  override val fmt = "gif"
  override val lossless = false // palette quantization on encode
  override def decode(bytes: Array[Byte]): BufferedImage =
    graft.functions.Gif.decodeFirstFrame(bytes)
  override def encode(img: BufferedImage): Array[Byte] =
    graft.functions.Gif.encodeGif(Seq(img))
}

/** QOI ("Quite OK Image"): REAL decode — the JDK has no reader for the
  * format, so [[graft.functions.Qoi]] owns the op-stream walk (index /
  * diff / luma / run / literal chunks). Lossless by construction, so the
  * J7 gate is exact-pixel. Driver-gated by q45. */
final class QoiDecoder extends PayloadDecoder {
  override val fmt = "qoi"
  override val lossless = true
  override def decode(bytes: Array[Byte]): BufferedImage = ImageOps.decode(bytes)
  override def encode(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    graft.functions.Qoi.encode(img.getRGB(0, 0, w, h, null, 0, w), w, h)
  }
}

/** WebP lossless (VP8L): REAL decode — the JDK has no WebP reader, so
  * [[graft.functions.Webp]] owns the bitstream (canonical prefix codes,
  * LZ77 + color cache, meta-prefix groups, the four spatial transforms).
  * Lossless by construction → exact-pixel J7 gate; the encode side is the
  * deterministic fixture encoder (subtract-green + color cache — every
  * image round-trips exactly). LOSSY WebP (VP8) needs the full DCT stack
  * and classifies as undecodable with the modern-codec stubs.
  * Driver-gated by q48. */
final class WebpDecoder extends PayloadDecoder {
  override val fmt = "webp"
  override val lossless = true
  override def decode(bytes: Array[Byte]): BufferedImage = ImageOps.decode(bytes)
  override def encode(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    graft.functions.Webp.encode(img.getRGB(0, 0, w, h, null, 0, w), w, h,
      graft.functions.Webp.WebpOptions(subtractGreen = true, cacheBits = 6))
  }
}

/** ICO favicons: REAL decode — the JDK has no reader, so
  * [[graft.functions.Ico]] owns the ICONDIR walk, DIB depths 1-32 with
  * the AND transparency mask, embedded-PNG members, and best-member
  * selection. DIB members are exact-pixel → lossless J7 gate.
  * Driver-gated by q50. */
final class IcoDecoder extends PayloadDecoder {
  override val fmt = "ico"
  override val lossless = true
  override def decode(bytes: Array[Byte]): BufferedImage = ImageOps.decode(bytes)
  override def encode(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    graft.functions.Ico.encode(Seq(graft.functions.Ico.Member(
      img.getRGB(0, 0, w, h, null, 0, w), w, h, 32)))
  }
}

/** TGA textures: REAL decode — the JDK has no reader, so
  * [[graft.functions.Tga]] owns the header walk, palette/truecolor/
  * grayscale raw+RLE types, and both origin flips. TGA has NO magic
  * bytes, so the format is registry-`fmt`-driven (never magic-sniffed) —
  * the one image format here dispatched purely by declared type, which
  * is how a crawl meets it (content type / extension). Exact decode →
  * lossless J7 gate. Driver-gated by q51. */
final class TgaDecoder extends PayloadDecoder {
  override val fmt = "tga"
  override val lossless = true
  override def decode(bytes: Array[Byte]): BufferedImage =
    graft.functions.Tga.decode(bytes)
  override def encode(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    graft.functions.Tga.encode(
      img.getRGB(0, 0, w, h, null, 0, w), w, h, imgType = 2, depth = 32)
  }
}

/** MODERN inter-frame video codecs (h264/vp9/…) and perceptual audio
  * (mp3/aac): those genuinely need codec libraries this container doesn't
  * ship, so decode is STUBBED (clearly marked); the registry/dispatch
  * plumbing, schema and batch shape are real and tested — uncompressed
  * Y4M video has the REAL [[Y4mDecoder]], MJPEG and inter-frame RLE8 AVIs
  * the REAL [[AviMjpegDecoder]], and WAV carries real PCM + G.711 + IMA
  * ADPCM decode ([[graft.functions.Wav]]). */
final class VideoFrameDecoderStub extends PayloadDecoder {
  override val fmt = "video"
  override val lossless = false
  override def decode(bytes: Array[Byte]): BufferedImage = // deterministic fake;
    // sampleFramesStub returns Seq.empty for undecodable bytes — that must
    // surface as the registry's null-decode contract, not a .head crash
    ImageOps.sampleFramesStub(bytes, 1).headOption.map(ImageOps.decode).orNull
  override def encode(img: BufferedImage): Array[Byte] = ImageOps.encode(img, "png")
}

/** Registry (reference `register_converter`/`get_converter` semantics:
  * last registration wins, unknown fmt → error). */
object DecoderRegistry {
  @volatile private var decoders: Map[String, PayloadDecoder] = Map(
    "png" -> new PngDecoder,
    "jpg" -> new JpgDecoder,
    "jpeg" -> new JpgDecoder,
    "y4m" -> new Y4mDecoder,
    "avi" -> new AviMjpegDecoder,
    "gif" -> new GifDecoder,
    "qoi" -> new QoiDecoder,
    "webp" -> new WebpDecoder,
    "ico" -> new IcoDecoder,
    "tga" -> new TgaDecoder,
    "video" -> new VideoFrameDecoderStub)

  /** "jpg"/"jpeg" are one format under two spellings — a registration for
    * either must win for BOTH, or get("jpeg") would keep serving the old
    * decoder after a "jpg" override. */
  private val aliases = Map("jpg" -> Seq("jpg", "jpeg"), "jpeg" -> Seq("jpg", "jpeg"))

  def register(d: PayloadDecoder): Unit = synchronized {
    aliases.getOrElse(d.fmt, Seq(d.fmt)).foreach(f => decoders += (f -> d))
  }
  def get(fmt: String): PayloadDecoder =
    decoders.getOrElse(fmt, throw new IllegalArgumentException(s"no decoder for $fmt"))
  def supported: Set[String] = decoders.keySet

  /** Formats whose registered decoder declares lossless — the plan-time
    * source for the engine's J7 pixel gate (the column form of
    * [[PayloadDecoder.valid]]; hardcoding the set at the validation site
    * would silently mis-validate any newly registered format). */
  def losslessFormats: Set[String] =
    decoders.collect { case (f, d) if d.lossless => f }.toSet
}
