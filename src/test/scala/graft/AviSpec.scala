package graft

import java.awt.image.BufferedImage
import java.nio.charset.StandardCharsets

import graft.functions.{Avi, ImageOps, VideoContainers}
import graft.fixtures.FixtureGen

/** X1 — REAL compressed-video decode: Motion-JPEG in the RIFF/AVI
  * container (container walk through the JDK's actual JPEG codec).
  * Round-trips, frame sampling, foreign-chunk walking, malformed-payload
  * classification, and the registry seam. */
class AviSpec extends SparkSpec {

  private def uniform(g: Int, w: Int = 16, h: Int = 16): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    img
  }

  private def gray(img: BufferedImage): Int = img.getRGB(0, 0) & 0xff

  test("encode → parse → decode round-trip: real JPEG bitstream per frame") {
    val imgs = (0L until 3L).map(s => ImageOps.toImage(
      ImageOps.syntheticPixels(s, 24, 18), 24, 18))
    val bytes = Avi.encodeMjpeg(imgs)
    // the movi payload is genuine JPEG: SOI marker FF D8 inside the chunk
    val p = Avi.parse(bytes).get
    assert(p.w == 24 && p.h == 18 && p.frameCount == 3)
    p.frames.foreach { case (off, _) =>
      assert((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8) // JPEG SOI
    }
    imgs.zipWithIndex.foreach { case (src, k) =>
      val dec = Avi.frame(bytes, p, k)
      assert(dec.getWidth == 24 && dec.getHeight == 18)
      // full-spectrum synthetic noise is JPEG's worst case — it lands just
      // under the 40 dB J7 gate (≈39 dB, same as a plain JPEG of the same
      // content); assert the decode is faithful, not that noise is easy
      assert(ImageOps.psnrImages(src, dec) >= 38.0, s"frame $k")
    }
  }

  test("fixture closed form: frame count, geometry, ±4 uniform-gray gate") {
    (0L until 9L).foreach { d =>
      val bytes = FixtureGen.aviMjpegBytes(d)
      val p = Avi.parse(bytes).get
      assert(p.frameCount == (d % 3).toInt + 1, s"doc $d")
      (0 until p.frameCount).foreach { k =>
        val img = Avi.frame(bytes, p, k)
        val expected = (10 + (29 * d + 13 * k) % 236).toInt
        val px = img.getRGB(0, 0, 16, 16, null, 0, 16)
        assert(px.forall { q =>
          Seq(16, 8, 0).forall(sh => math.abs(((q >> sh) & 0xff) - expected) <= 4)
        }, s"doc $d frame $k: decoded far from $expected")
      }
    }
  }

  test("sampleFramesIndexed: floor-spaced distinct source indices") {
    // frames carry distinct grays 12 apart (> 2× the JPEG tolerance), so
    // the decoded gray identifies which source frame was sampled
    val m = 11
    val bytes = Avi.encodeMjpeg((0 until m).map(k => uniform(10 + 12 * k)))
    Seq(1, 2, 3, 7, 11, 50).foreach { n =>
      val sampled = Avi.sampleFramesIndexed(bytes, n)
      val k = math.min(n, m)
      assert(sampled.map(_._1) == (0 until k).map(j => (j.toLong * m / k).toInt), s"n=$n")
      sampled.foreach { case (idx, img) =>
        assert(math.abs(gray(img) - (10 + 12 * idx)) <= 4, s"n=$n idx=$idx")
      }
    }
    // magic sniffing routes AVI payloads to the same decode
    assert(VideoContainers.sampleFramesIndexed(bytes, 3).map(_._1) ==
      Avi.sampleFramesIndexed(bytes, 3).map(_._1))
  }

  test("container walk: JUNK before hdrl and idx1 after movi still parse") {
    val plain = Avi.encodeMjpeg(Seq(uniform(100), uniform(200)))
    // splice a top-level JUNK chunk right after the 12-byte RIFF header and
    // an idx1 chunk at the end; fix up the RIFF size
    val junk = "JUNK".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](6, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val idx1 = "idx1".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0)
    val out = new Array[Byte](plain.length + junk.length + idx1.length)
    System.arraycopy(plain, 0, out, 0, 12)
    System.arraycopy(junk, 0, out, 12, junk.length)
    System.arraycopy(plain, 12, out, 12 + junk.length, plain.length - 12)
    System.arraycopy(idx1, 0, out, plain.length + junk.length, idx1.length)
    val riffLen = (out.length - 8).toLong
    (0 until 4).foreach(j => out(4 + j) = ((riffLen >> (8 * j)) & 0xff).toByte)
    val p = Avi.parse(out).get
    assert(p.frameCount == 2 && p.w == 16 && p.h == 16)
    assert(math.abs(gray(Avi.frame(out, p, 0)) - 100) <= 4 &&
      math.abs(gray(Avi.frame(out, p, 1)) - 200) <= 4)
  }

  test("malformed payloads classify (None/empty/null), never throw") {
    assert(Avi.parse(null).isEmpty)
    assert(Avi.parse(Array.emptyByteArray).isEmpty)
    assert(Avi.parse("RIFF 123 WAVE".getBytes(StandardCharsets.US_ASCII)).isEmpty)
    assert(Avi.parse("not a video".getBytes(StandardCharsets.US_ASCII)).isEmpty)
    assert(Avi.decodeFirstFrame(null) == null)
    val good = FixtureGen.aviMjpegBytes(2L) // 3 frames
    // truncation mid-movi: surviving full chunks still decode, no throw
    val p = Avi.parse(good).get
    val cutAt = p.frames(2)._1 - 8 // drop the third frame's chunk header on
    val cut = java.util.Arrays.copyOfRange(good, 0, cutAt)
    assert(Avi.parse(cut).forall(_.frameCount <= 2))
    assert(Avi.sampleFramesIndexed(cut, 4).size <= 2) // classify, not crash
    // hostile u32-max chunk size must not overflow the walk
    val hostile = good.clone()
    val moviOff = p.frames(0)._1 - 8 // first 00dc chunk header
    hostile(moviOff + 4) = 0xff.toByte; hostile(moviOff + 5) = 0xff.toByte
    hostile(moviOff + 6) = 0xff.toByte; hostile(moviOff + 7) = 0xfe.toByte
    Avi.parse(hostile) // clamped; any outcome but a throw
    // a corrupted JPEG payload classifies: frame 0's body is zeroed after
    // SOI (undecodable for sure), so sampling all 3 frames must DROP it and
    // keep exactly the two intact ones — not emit it, not throw
    val badJpeg = good.clone()
    val (f0off, f0len) = p.frames(0)
    java.util.Arrays.fill(badJpeg, f0off + 2, f0off + f0len, 0.toByte)
    assert(Avi.sampleFramesIndexed(badJpeg, 4).map(_._1) == Seq(1, 2))
  }

  test("stream binding + rec interleave: the vids stream's frames, only those") {
    // hand-built two-stream AVI: stream 0 = auds, stream 1 = vids; movi
    // carries an audio chunk, a frame wrapped in a LIST 'rec ' interleave
    // record, a plain frame, and a '00dc' chunk on the AUDIO stream number
    // that a naive ##dc scan would miscount as video
    def u32le(v: Int): Array[Byte] = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes(StandardCharsets.US_ASCII) ++ u32le(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes(StandardCharsets.US_ASCII) ++ body)
    val jpeg1 = ImageOps.encode(uniform(60), "jpg")
    val jpeg2 = ImageOps.encode(uniform(180), "jpg")
    val avih = new Array[Byte](56)
    System.arraycopy(u32le(16), 0, avih, 32, 4) // dwWidth
    System.arraycopy(u32le(16), 0, avih, 36, 4) // dwHeight
    def strh(fcc: String) =
      fcc.getBytes(StandardCharsets.US_ASCII) ++ new Array[Byte](52)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh("auds"))) ++
      list("strl", chunk("strh", strh("vids"))))
    val movi = list("movi",
      chunk("00wb", Array[Byte](1, 2, 3, 4)) ++ // audio data: skipped
        list("rec ", chunk("01dc", jpeg1)) ++ // interleave record: recursed
        chunk("01dc", jpeg2) ++
        chunk("00dc", jpeg1)) // stream-0 'dc' chunk: NOT the vids stream
    val payload = hdrl ++ movi
    val bytes = "RIFF".getBytes(StandardCharsets.US_ASCII) ++
      u32le(payload.length + 4) ++
      "AVI ".getBytes(StandardCharsets.US_ASCII) ++ payload
    val p = Avi.parse(bytes).get
    assert(p.frameCount == 2 && p.w == 16 && p.h == 16)
    assert(math.abs(gray(Avi.frame(bytes, p, 0)) - 60) <= 4)
    assert(math.abs(gray(Avi.frame(bytes, p, 1)) - 180) <= 4)
  }

  test("dib 24-bit: exact color round-trip pins BGR byte order and bottom-up rows") {
    // full-color asymmetric image: a BGR/RGB swap turns the red corner
    // blue; a non-flipped row read moves it to the other side
    val img = new BufferedImage(6, 5, BufferedImage.TYPE_INT_RGB)
    (0 until 5).foreach(y => (0 until 6).foreach { x =>
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 50) << 8) | (x + y))
    })
    img.setRGB(0, 0, 0xff0000) // pure red at the top-left
    val bytes = Avi.encodeDib24(Seq(img))
    val p = Avi.parse(bytes).get
    assert(p.isDib && !p.topDown && p.bitCount == 24)
    val back = Avi.frame(bytes, p, 0)
    assert(back.getRGB(0, 0, 6, 5, null, 0, 6).toSeq ==
      img.getRGB(0, 0, 6, 5, null, 0, 6).toSeq)
    // the raster really is bottom-up on disk: the LAST stored row holds
    // the pure-red top-left pixel's BGR bytes (0,0,255)
    val moviFrame = p.frames.head
    val stride = (6 * 3 + 3) & ~3
    val lastRow = moviFrame._1 + stride * 4
    assert((bytes(lastRow) & 0xff, bytes(lastRow + 1) & 0xff, bytes(lastRow + 2) & 0xff)
      == ((0, 0, 255)))
  }

  test("dib: negative strf biHeight means top-down — same logical image, flipped disk layout") {
    val img = new BufferedImage(6, 5, BufferedImage.TYPE_INT_RGB)
    (0 until 5).foreach(y => (0 until 6).foreach(x => img.setRGB(x, y, (y * 30) << 16)))
    val up = Avi.encodeDib24(Seq(img))
    val down = Avi.encodeDib24(Seq(img), topDown = true)
    assert(!Avi.parse(up).get.topDown && Avi.parse(down).get.topDown)
    // both decode to the SAME logical image…
    Seq(up, down).foreach { b =>
      val p = Avi.parse(b).get
      assert(Avi.frame(b, p, 0).getRGB(0, 0, 6, 5, null, 0, 6).toSeq ==
        img.getRGB(0, 0, 6, 5, null, 0, 6).toSeq)
    }
    // …from DIFFERENT disk rasters (first stored row differs)
    val pu = Avi.parse(up).get; val pd = Avi.parse(down).get
    assert(bytes2(up, pu.frames.head._1, 18) != bytes2(down, pd.frames.head._1, 18))
  }

  private def bytes2(b: Array[Byte], off: Int, n: Int): Seq[Byte] =
    java.util.Arrays.copyOfRange(b, off, off + n).toSeq

  test("dib 8-bit: palette lookup + stride padding; truncated frame classifies") {
    val pal = Array.tabulate(256)(i => 0xff000000 | (i << 16) | ((255 - i) << 8) | i)
    val idx = Array.tabulate[Byte](6 * 5)(i => (i % 11).toByte)
    val bytes = Avi.encodeDib8(6, 5, pal, Seq(idx))
    val p = Avi.parse(bytes).get
    assert(p.isDib && p.bitCount == 8)
    val back = Avi.frame(bytes, p, 0)
    (0 until 30).foreach { i =>
      assert(back.getRGB(i % 6, i / 6) == pal(i % 11), s"px $i")
    }
    // cut into the frame raster: the frame is incomplete → null (classify)
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 6)
    val pc = Avi.parse(cut).get
    assert(Avi.frame(cut, pc, 0) == null)
    assert(Avi.sampleFramesIndexed(cut, 4).isEmpty) // dropped, not thrown
  }

  test("dib fixture: closed form through VideoContainers, all three variants") {
    (0L until 12L).foreach { d =>
      val frames = VideoContainers.sampleFramesIndexed(FixtureGen.aviDibBytes(d), Int.MaxValue)
      assert(frames.length == (d % 3).toInt + 1, s"doc $d")
      frames.foreach { case (k, img) =>
        assert(img.getWidth == 6 && img.getHeight == 5, s"doc $d frame $k")
        (0 until 30).foreach { i =>
          val x = i % 6; val y = i / 6
          val v =
            if (d % 3 == 1) (10 + (29 * d) % 160).toInt + 5 * ((x + y + 3 * k) % 16)
            else (20 + (31 * d + 7 * k) % 200).toInt + x + 2 * y
          assert((img.getRGB(x, y) & 0xff) == v, s"doc $d frame $k px $i")
        }
      }
    }
  }

  test("registry seam: avi is a registered lossy decoder; J7 gate applies") {
    val d = graft.sources.DecoderRegistry.get("avi")
    assert(!d.lossless)
    val img = uniform(123, 20, 12)
    val rt = d.decode(d.encode(img))
    assert(rt != null && rt.getWidth == 20 && rt.getHeight == 12)
    assert(ImageOps.psnrImages(img, rt) >= 40.0 && d.valid(ImageOps.psnrImages(img, rt)))
    assert(!graft.sources.DecoderRegistry.losslessFormats.contains("avi"))
  }
}
