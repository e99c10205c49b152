package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.FixtureGen
import graft.functions.{MediaMeta, Mkv, Mp4}

/** Single-pass media triage ([[graft.functions.MediaMeta]]): the
  * content-sniffed dispatch over the whole container family. The q57
  * oracle pins the per-family closed forms at the driver; this spec pins
  * the ROUTING itself — kind/container per family, the audio-only
  * container variants the fixture cycle can't reach, the animated-vs-
  * still split, the signature-less TGA honesty case, and the
  * never-throw contract under truncation and junk.
  */
class MediaMetaSpec extends AnyFunSuite {

  private val quotients = 0L until 60L

  test("every fixture family routes to its kind/container/codec") {
    for (q <- quotients) {
      def d(b: Array[Byte]) = MediaMeta.describe(b)

      val jpeg = d(FixtureGen.jpegExifBytes(q))
      assert((jpeg.kind, jpeg.container, jpeg.codec) == (("image", "jpeg", "jpeg")))
      assert(jpeg.width == 24 + q % 40 && jpeg.height == 16 + q % 32)
      assert(jpeg.durationMs == -1L && jpeg.sampleRate == -1 && jpeg.channels == -1)

      val mp4 = d(FixtureGen.mp4Bytes(q))
      assert(mp4.kind == "video" && mp4.container == "mp4")
      assert(mp4.durationMs == 40L * (24 + q % 48))
      assert(mp4.channels == 1 + q % 2)

      val mkv = d(FixtureGen.mkvBytes(q))
      assert(mkv.kind == "video")
      assert(mkv.container == (if (q % 2 == 0) "webm" else "matroska"))
      assert(mkv.width == 320 + 16 * (q % 20) && mkv.height == 180 + 2 * (q % 50))

      val ogg = d(FixtureGen.oggBytes(q))
      assert(ogg.kind == "audio" && ogg.container == "ogg")
      assert(ogg.codec == (if (q % 2 == 0) "vorbis" else "opus"))
      assert(ogg.width == -1 && ogg.height == -1)

      val wav = d(FixtureGen.wavBytes(q))
      assert((wav.kind, wav.container, wav.codec) == (("audio", "wav", "pcm")))
      assert(wav.sampleRate == 8000 && wav.channels == 1)
      assert(wav.durationMs == (100 + q % 50) * 1000L / 8000L)

      val mp3 = d(FixtureGen.mp3Bytes(q))
      assert((mp3.kind, mp3.container, mp3.codec) == (("audio", "mpeg", "mp3")))
      assert(mp3.channels == 1 + q % 2)

      val y4m = d(FixtureGen.y4mBytes(q))
      assert((y4m.kind, y4m.container, y4m.codec) == (("video", "y4m", "rawvideo")))
      assert(y4m.width == 8 && y4m.height == 4)

      val gif = d(FixtureGen.gifBytes(q))
      assert(gif.kind == (if (q % 3 == 0) "image" else "video"))
      assert(gif.container == "gif" && gif.width == 16 && gif.height == 16)

      val qoi = d(FixtureGen.qoiBytes(q))
      assert((qoi.kind, qoi.container) == (("image", "qoi")))
      assert(qoi.width == 16 && qoi.height == 16)

      val webp = d(FixtureGen.webpBytes(q))
      assert((webp.kind, webp.container, webp.codec) == (("image", "webp", "vp8l")))
      assert(webp.width == 21 && webp.height == 13)

      val ico = d(FixtureGen.icoBytes(q))
      assert((ico.kind, ico.container) == (("image", "ico")))
      assert(ico.width == 18 && ico.height == 11, "best (larger) member selected")
    }
  }

  test("animated WebP and APNG triage as video; a plain PNG as image") {
    for (q <- quotients) {
      val anim = MediaMeta.describe(FixtureGen.animWebpBytes(q))
      assert(anim.kind == "video" && anim.container == "webp")
      assert(anim.width == 20 && anim.height == 12)

      val apng = MediaMeta.describe(FixtureGen.apngBytes(q))
      assert(apng.kind == "video" && apng.container == "apng" && apng.codec == "png")
    }
    val img = new java.awt.image.BufferedImage(5, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = MediaMeta.describe(bos.toByteArray)
    assert((png.kind, png.container, png.width, png.height) == (("image", "png", 5, 7)))
  }

  test("audio-only MP4 and MKV triage as audio with the track's facts") {
    val mp4 = MediaMeta.describe(Mp4.encode("isom", 1000,
      video = None, audio = Some(Mp4.AudioSpec("mp4a", 44100, 2, 50, 882))))
    assert(mp4.kind == "audio" && mp4.container == "mp4" && mp4.codec == "mp4a")
    assert(mp4.sampleRate == 44100 && mp4.channels == 2 && mp4.width == -1)

    val mkv = MediaMeta.describe(Mkv.encode("matroska", 2500.0,
      video = None, audio = Some(Mkv.AudioTrack("A_FLAC", 48000, 1))))
    assert(mkv.kind == "audio" && mkv.container == "matroska" && mkv.codec == "A_FLAC")
    assert(mkv.durationMs == 2500L && mkv.sampleRate == 48000 && mkv.channels == 1)
  }

  test("the remaining audio containers route: g711/adpcm WAV, flac, aiff, au") {
    val g711 = MediaMeta.describe(FixtureGen.g711Bytes(2L))
    assert(g711.kind == "audio" && g711.container == "wav" && g711.codec == "g711_ulaw")
    val g711a = MediaMeta.describe(FixtureGen.g711Bytes(3L))
    assert(g711a.codec == "g711_alaw")
    val adpcm = MediaMeta.describe(FixtureGen.adpcmBytes(5L))
    assert(adpcm.kind == "audio" && adpcm.codec == "ima_adpcm")
    val ms = MediaMeta.describe(FixtureGen.msAdpcmBytes(5L))
    assert(ms.kind == "audio" && ms.codec == "ms_adpcm")
    val flac = MediaMeta.describe(FixtureGen.flacBytes(5L))
    assert(flac.kind == "audio" && flac.container == "flac")
    // bigEndianAudioBytes cycles AIFF (even) / AU (odd)
    val aiff = MediaMeta.describe(FixtureGen.bigEndianAudioBytes(4L))
    assert(aiff.kind == "audio" && aiff.container == "aiff")
    val au = MediaMeta.describe(FixtureGen.bigEndianAudioBytes(5L))
    assert(au.kind == "audio" && au.container == "au")
  }

  test("AVI videos triage as video with first-frame dims") {
    for (((gen, w, h), q) <- Seq[(Long => Array[Byte], Int, Int)](
        (FixtureGen.aviDibBytes, 6, 5), (FixtureGen.aviMjpegBytes, 16, 16),
        (FixtureGen.aviRleBytes, 16, 16)).flatMap(g => Seq(0L, 7L).map((g, _)))) {
      val m = MediaMeta.describe(gen(q))
      assert(m.kind == "video" && m.container == "avi")
      assert(m.width == w && m.height == h)
    }
  }

  test("signature-less TGA is honestly unknown by content") {
    for (q <- quotients) {
      val m = MediaMeta.describe(FixtureGen.tgaBytes(q))
      assert(m.kind == "unknown" && m.container == "unknown")
    }
  }

  test("document binaries route as kind=document; a bare zip is not a docx") {
    for (q <- quotients) {
      val pdf = MediaMeta.describe(FixtureGen.pdfBytes(q))
      assert(pdf.kind == "document" && pdf.container == "pdf")
      assert(pdf.codec == "1." + (4 + q % 4))

      val warc = MediaMeta.describe(FixtureGen.warcBytes(q))
      assert(warc.kind == "document" && warc.container == "warc")
      assert(warc.codec == (if (q % 2 == 0) "1.1" else "1.0"))

      val docx = MediaMeta.describe(FixtureGen.docxBytes(q))
      assert(docx.kind == "document" && docx.container == "docx" &&
        docx.codec == "wordprocessingml")
    }
    // a legitimate zip with no WordprocessingML inside is container=zip
    val bare = graft.functions.Zip.encode(Vector(
      ("readme.txt", "hi".getBytes("UTF-8"), 0)))
    val m = MediaMeta.describe(bare)
    assert(m.kind == "document" && m.container == "zip" && m.codec == "")
  }

  test("junk, null, empty, and truncated payloads classify — never throw") {
    assert(MediaMeta.describe(null).kind == "unknown")
    assert(MediaMeta.describe(Array.emptyByteArray).kind == "unknown")
    assert(MediaMeta.describe(Array.fill(256)(0x5a.toByte)).kind == "unknown")
    val rnd = new scala.util.Random(20260819L)
    val noise = Array.fill(4096)(rnd.nextInt().toByte)
    MediaMeta.describe(noise) // any outcome but a throw
    for (gen <- Seq[Long => Array[Byte]](
        FixtureGen.jpegExifBytes, FixtureGen.mp4Bytes, FixtureGen.mkvBytes,
        FixtureGen.oggBytes, FixtureGen.wavBytes, FixtureGen.mp3Bytes,
        FixtureGen.y4mBytes, FixtureGen.gifBytes, FixtureGen.qoiBytes,
        FixtureGen.webpBytes, FixtureGen.icoBytes)) {
      val full = gen(9L)
      var cut = 1
      while (cut < full.length) {
        MediaMeta.describe(full.take(cut)) // never a throw
        cut += (full.length / 37).max(1)
      }
    }
  }
}
