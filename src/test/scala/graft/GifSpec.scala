package graft

import java.awt.image.BufferedImage

import graft.functions.{Gif, VideoContainers}
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** X1 — REAL animated-GIF decode: LZW/palette via the JDK codec plus the
  * animation semantics this module owns — patch offsets, disposal
  * methods, canvas compositing, floor-spaced sampling — against
  * hand-placed frames and the q41 closed-form fixture. */
class GifSpec extends AnyFunSuite {

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

  test("fixture frames round-trip EXACTLY (LZW is lossless for in-palette colors)") {
    (0L until 9L).foreach { d =>
      val bytes = FixtureGen.gifBytes(d)
      val frames = Gif.sampleFramesIndexed(bytes, Int.MaxValue)
      assert(frames.length == (d % 3).toInt + 1, s"doc $d")
      frames.foreach { case (k, img) =>
        assert(img.getWidth == 16 && img.getHeight == 16, s"doc $d frame $k")
        val expected = (12 + (37 * d + 11 * k) % 232).toInt
        (0 until 16).foreach(y => (0 until 16).foreach(x =>
          assert(grayAt(img, x, y) == expected, s"doc $d frame $k ($x,$y)")))
      }
      // the magic-sniffed dispatch routes GIF payloads here
      assert(VideoContainers.sampleFramesIndexed(bytes, 2).nonEmpty)
    }
  }

  test("frames are PATCHES: an offset patch composites onto the prior canvas") {
    val bytes = Gif.encodeGifPlaced(Seq(
      (uniform(8, 8, 50), 0, 0, "none"),
      (uniform(4, 4, 200), 2, 2, "none")))
    val frames = Gif.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(frames.map(_._1) == Seq(0, 1))
    val f1 = frames(1)._2
    assert(f1.getWidth == 8 && f1.getHeight == 8) // logical screen, not 4×4
    assert(grayAt(f1, 0, 0) == 50 && grayAt(f1, 7, 7) == 50) // base survives
    assert(grayAt(f1, 2, 2) == 200 && grayAt(f1, 5, 5) == 200) // patch landed
    assert(grayAt(f1, 1, 1) == 50 && grayAt(f1, 6, 6) == 50)
  }

  test("restoreToBackgroundColor clears exactly the patch rect before the next frame") {
    val bytes = Gif.encodeGifPlaced(Seq(
      (uniform(8, 8, 50), 0, 0, "none"),
      (uniform(4, 4, 200), 2, 2, "restoreToBackgroundColor"),
      (uniform(2, 2, 99), 0, 0, "none")))
    val frames = Gif.sampleFramesIndexed(bytes, Int.MaxValue)
    val f1 = frames(1)._2
    assert(grayAt(f1, 3, 3) == 200) // visible while displayed
    val f2 = frames(2)._2
    assert(alphaAt(f2, 3, 3) == 0, "disposed rect must be cleared")
    assert(grayAt(f2, 0, 0) == 99)  // the new patch
    assert(grayAt(f2, 7, 7) == 50 && alphaAt(f2, 7, 7) == 255) // outside both
  }

  test("restoreToPrevious rolls the canvas back after the frame displays") {
    val bytes = Gif.encodeGifPlaced(Seq(
      (uniform(8, 8, 50), 0, 0, "none"),
      (uniform(4, 4, 200), 2, 2, "restoreToPrevious"),
      (uniform(2, 2, 99), 0, 0, "none")))
    val frames = Gif.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(grayAt(frames(1)._2, 3, 3) == 200) // displayed in its own frame
    val f2 = frames(2)._2
    assert(grayAt(f2, 3, 3) == 50, "patch must be rolled back")
    assert(grayAt(f2, 0, 0) == 99)
  }

  test("sampling is floor-spaced with SOURCE indices, like Y4M/AVI") {
    val frames = (0 until 10).map(k => (uniform(4, 4, 20 + k), 0, 0, "none"))
    val bytes = Gif.encodeGifPlaced(frames)
    val sampled = Gif.sampleFramesIndexed(bytes, 4)
    assert(sampled.map(_._1) == Seq(0, 2, 5, 7)) // j·m/k floor spacing
    sampled.foreach { case (k, img) => assert(grayAt(img, 0, 0) == 20 + k) }
    assert(Gif.frameCount(bytes) == 10)
  }

  test("registry: gif decoder is registered and declares lossy (palette quantization)") {
    val d = graft.sources.DecoderRegistry.get("gif")
    val img = d.decode(FixtureGen.gifBytes(4L))
    assert(img != null && img.getWidth == 16)
    assert(grayAt(img, 3, 3) == (12 + (37 * 4) % 232))
    assert(!graft.sources.DecoderRegistry.losslessFormats.contains("gif"))
    // in-palette content DOES round-trip exactly through encode→decode
    val rt = d.decode(d.encode(uniform(5, 5, 77)))
    (0 until 5).foreach(y => (0 until 5).foreach(x => assert(grayAt(rt, x, y) == 77)))
  }

  test("a hostile logical screen (decompression bomb) classifies, never allocates") {
    // a few-hundred-byte GIF can CLAIM any screen; patch the fixture's
    // LogicalScreenDescriptor (little-endian u16s at offsets 6..9) to
    // 16384x16384 — the 1 GiB ARGB canvas must never be allocated
    val bomb = FixtureGen.gifBytes(1L).clone()
    bomb(6) = 0x00; bomb(7) = 0x40 // width 16384
    bomb(8) = 0x00; bomb(9) = 0x40 // height 16384
    assert(Gif.sampleFramesIndexed(bomb, 4).isEmpty)
  }

  test("encodeGifPlaced rejects out-of-screen patches loudly (decode would clip them)") {
    intercept[IllegalArgumentException] {
      Gif.encodeGifPlaced(Seq(
        (uniform(8, 8, 50), 0, 0, "none"),
        (uniform(4, 4, 200), 6, 6, "none"))) // 6+4 > 8
    }
    intercept[IllegalArgumentException] {
      Gif.encodeGifPlaced(Seq((uniform(8, 8, 50), 1, 0, "none"))) // frame 0 off-origin
    }
  }

  test("malformed / truncated / foreign payloads classify, never throw") {
    assert(Gif.sampleFramesIndexed(null, 4).isEmpty)
    assert(Gif.sampleFramesIndexed(Array.emptyByteArray, 4).isEmpty)
    assert(Gif.sampleFramesIndexed("GIF89a".getBytes, 4).isEmpty)
    assert(Gif.sampleFramesIndexed("GIF88a123456789".getBytes, 4).isEmpty)
    val full = FixtureGen.gifBytes(2L)
    // a truncated stream yields at most the complete prefix, never a throw
    val cut = Gif.sampleFramesIndexed(full.dropRight(full.length / 2), 4)
    assert(cut.length <= 3)
    assert(Gif.decodeFirstFrame(FixtureGen.gifBytes(0L)) != null)
    assert(Gif.decodeFirstFrame(Array[Byte](1, 2, 3)) == null)
  }
}
