package graft

import java.awt.image.BufferedImage

import graft.functions.{AnimWebp, ImageOps, VideoContainers, Webp}
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** X1 — REAL animated-WebP decode: the JDK has no WebP reader at all, so
  * the VP8X/ANIM/ANMF walk, per-frame VP8L decode, and blend/dispose
  * compositing are all this module's — spec'd against hand-placed
  * patches, alpha blending, background disposal, and the q49 fixture. */
class AnimWebpSpec extends AnyFunSuite {

  private def uniform(w: Int, h: Int, gray: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    img
  }
  private def grayAt(img: BufferedImage, x: Int, y: Int): Int =
    img.getRGB(x, y) & 0xff
  private def alphaAt(img: BufferedImage, x: Int, y: Int): Int =
    (img.getRGB(x, y) >>> 24) & 0xff

  test("fixture decodes to the two-region closed form — INTER-FRAME compositing is real") {
    (0L until 12L).foreach { d =>
      val bytes = FixtureGen.animWebpBytes(d)
      val frames = AnimWebp.sampleFramesIndexed(bytes, Int.MaxValue)
      assert(frames.length == (d % 3).toInt + 1, s"doc $d")
      val g0 = (16 + (47 * d) % 224).toInt
      frames.foreach { case (k, img) =>
        assert(img.getWidth == 20 && img.getHeight == 12, s"doc $d frame $k")
        val gk = if (k == 0) g0 else (16 + (47 * d + 23 * k) % 224).toInt
        (0 until 12).foreach(y => (0 until 20).foreach { x =>
          val expect = if (x >= 6 && x < 14 && y >= 4 && y < 10) gk else g0
          assert(grayAt(img, x, y) == expect, s"doc $d frame $k ($x,$y)")
          assert(alphaAt(img, x, y) == 255, s"doc $d frame $k ($x,$y) alpha")
        })
      }
      assert(VideoContainers.sampleFramesIndexed(bytes, 2).nonEmpty, s"doc $d")
    }
  }

  test("a standalone-frame decode CANNOT fake it: later ANMF payloads are 8x6 patches") {
    // frame 1's own bitstream is only the patch — the background around it
    // exists only on the composited canvas
    val bytes = FixtureGen.animWebpBytes(1L) // 2 frames
    val frames = AnimWebp.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(frames.length == 2)
    // the fixture's frame-1 VP8L chunk alone is an 8x6 image, not 20x12:
    // rewrap every VP8L in the container and note the geometries
    val geoms = Seq.newBuilder[(Int, Int)]
    var i = 12
    def u32le(p: Int): Long = (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
      ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    while (i + 8 <= bytes.length) {
      val typ = new String(bytes, i, 4, "US-ASCII")
      val size = u32le(i + 4).toInt
      if (typ == "ANMF") {
        var j = i + 8 + 16
        val end = i + 8 + size
        while (j + 8 <= end) {
          val st = new String(bytes, j, 4, "US-ASCII")
          val ss = u32le(j + 4).toInt
          if (st == "VP8L") {
            val hdr = "RIFF????WEBP".getBytes("US-ASCII")
            val chunkLen = 8 + ss + (ss & 1)
            val standalone = new Array[Byte](12 + chunkLen)
            System.arraycopy(hdr, 0, standalone, 0, 12)
            System.arraycopy(bytes, j, standalone, 12, chunkLen)
            val riffSize = standalone.length - 8
            standalone(4) = (riffSize & 0xff).toByte
            standalone(5) = ((riffSize >>> 8) & 0xff).toByte
            standalone(6) = ((riffSize >>> 16) & 0xff).toByte
            standalone(7) = ((riffSize >>> 24) & 0xff).toByte
            val img = Webp.decode(standalone)
            assert(img != null)
            geoms += ((img.getWidth, img.getHeight))
          }
          j += 8 + ss + (ss & 1)
        }
      }
      i += 8 + size + (size & 1)
    }
    assert(geoms.result() == Seq((20, 12), (8, 6)))
  }

  test("blend=0 alpha-blends: transparent patch pixels keep the canvas underneath") {
    val patch = new BufferedImage(4, 4, BufferedImage.TYPE_INT_ARGB)
    (0 until 4).foreach(y => (0 until 4).foreach { x =>
      // left half fully transparent, right half opaque gray 200
      patch.setRGB(x, y, if (x < 2) 0x00000000 else 0xffc8c8c8)
    })
    val bytes = AnimWebp.encodeAnimWebp(Seq(
      (uniform(8, 8, 50), 0, 0, 0, 1),
      (patch, 2, 2, 0, 0))) // blend 0 = alpha-blend over the canvas
    val frames = AnimWebp.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(frames.map(_._1) == Seq(0, 1))
    val f1 = frames(1)._2
    assert(grayAt(f1, 2, 3) == 50 && alphaAt(f1, 2, 3) == 255, "transparent keeps canvas")
    assert(grayAt(f1, 4, 3) == 200, "opaque replaces")
    assert(grayAt(f1, 0, 0) == 50 && grayAt(f1, 7, 7) == 50)
  }

  test("blend=1 overwrites the rect, alpha included") {
    val patch = new BufferedImage(4, 4, BufferedImage.TYPE_INT_ARGB)
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      patch.setRGB(x, y, if (x < 2) 0x00000000 else 0xffc8c8c8)))
    val bytes = AnimWebp.encodeAnimWebp(Seq(
      (uniform(8, 8, 50), 0, 0, 0, 1),
      (patch, 2, 2, 0, 1))) // blend 1 = do NOT blend
    val f1 = AnimWebp.sampleFramesIndexed(bytes, Int.MaxValue)(1)._2
    assert(alphaAt(f1, 2, 3) == 0, "transparent pixel must PUNCH THROUGH")
    assert(grayAt(f1, 4, 3) == 200)
    assert(grayAt(f1, 0, 0) == 50)
  }

  test("dispose=1 clears the frame rect to transparent (libwebp/Chrome/Firefox behavior)") {
    // even with a non-transparent ANIM background on the wire, the
    // de-facto renderers dispose to transparent black — match them
    val bg = 0xff4d4d4d // opaque gray 77, deliberately NOT painted
    val bytes = AnimWebp.encodeAnimWebp(Seq(
      (uniform(8, 8, 50), 0, 0, 0, 1),
      (uniform(4, 4, 200), 2, 2, 1, 1), // dispose 1 = background
      (uniform(2, 2, 99), 0, 0, 0, 1)), background = bg)
    val frames = AnimWebp.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(grayAt(frames(1)._2, 3, 3) == 200)
    assert(alphaAt(frames(2)._2, 3, 3) == 0, "disposed rect must be transparent")
    assert(grayAt(frames(2)._2, 0, 0) == 99)
    assert(grayAt(frames(2)._2, 7, 7) == 50 && alphaAt(frames(2)._2, 7, 7) == 255)
  }

  test("trailing junk after the declared RIFF size is tolerated (trailer parity)") {
    val bytes = FixtureGen.animWebpBytes(1L)
    val padded = bytes ++ Array.fill(9)(0x5a.toByte)
    assert(AnimWebp.isAnimWebp(padded))
    val frames = AnimWebp.sampleFramesIndexed(padded, Int.MaxValue)
    assert(frames.length == 2, "trailer must not reject a decodable animation")
    assert(grayAt(frames(0)._2, 0, 0) == (16 + 47 % 224))
  }

  test("sampling is floor-spaced with SOURCE indices, like the rest of the family") {
    val frames = (0 until 10).map(k =>
      (uniform(4, 4, 20 + k), 0, 0, 0, 1): AnimWebp.Placed)
    val sampled = AnimWebp.sampleFramesIndexed(AnimWebp.encodeAnimWebp(frames), 4)
    assert(sampled.map(_._1) == Seq(0, 2, 5, 7))
    sampled.foreach { case (k, img) => assert(grayAt(img, 0, 0) == 20 + k) }
  }

  test("the stills path shows the first composited frame (GIF/APNG parity)") {
    val bytes = FixtureGen.animWebpBytes(2L)
    val still = ImageOps.decode(bytes)
    assert(still != null && still.getWidth == 20 && still.getHeight == 12)
    assert(grayAt(still, 0, 0) == (16 + (47 * 2) % 224))
    assert(AnimWebp.frameCount(bytes) == 3)
  }

  test("still WebPs are not animations; lossy frames classify the payload") {
    val still = Webp.encode(Array.fill(16)(0xff404040), 4, 4)
    assert(!AnimWebp.isAnimWebp(still))
    assert(AnimWebp.sampleFramesIndexed(still, 4).isEmpty)
    assert(VideoContainers.sampleFramesIndexed(still, 4).isEmpty)
    // patch the first frame's VP8L tag to lossy "VP8 ": honest refusal
    val anim = FixtureGen.animWebpBytes(3L)
    val idx = anim.indices.find(i => i >= 30 && i + 4 <= anim.length &&
      anim(i) == 'V' && anim(i + 1) == 'P' && anim(i + 2) == '8' && anim(i + 3) == 'L').get
    val lossy = anim.clone(); lossy(idx + 3) = ' '
    assert(AnimWebp.sampleFramesIndexed(lossy, 4).isEmpty)
  }

  test("hostile payloads classify: truncation, garbage, canvas bombs, bad encode args") {
    val bytes = FixtureGen.animWebpBytes(1L)
    (1 to 60 by 9).foreach(c =>
      assert(AnimWebp.sampleFramesIndexed(bytes.dropRight(c), 4).isEmpty, s"cut $c"))
    assert(AnimWebp.sampleFramesIndexed(null, 4).isEmpty)
    assert(AnimWebp.sampleFramesIndexed("RIFFxxxxWEBP".getBytes("US-ASCII"), 4).isEmpty)
    // a claimed 16M x 16M canvas must never allocate: VP8X canvas dims sit
    // at fixed offsets 24..29 in the encoder's layout
    val bomb = bytes.clone()
    (24 to 29).foreach(i => bomb(i) = 0xff.toByte)
    assert(AnimWebp.sampleFramesIndexed(bomb, 4).isEmpty)
    intercept[IllegalArgumentException] { // odd offsets are unrepresentable
      AnimWebp.encodeAnimWebp(Seq(
        (uniform(8, 8, 50), 0, 0, 0, 1), (uniform(4, 4, 200), 3, 2, 0, 1)))
    }
    intercept[IllegalArgumentException] { // out-of-canvas patch
      AnimWebp.encodeAnimWebp(Seq(
        (uniform(8, 8, 50), 0, 0, 0, 1), (uniform(4, 4, 200), 6, 6, 0, 1)))
    }
  }
}
