package graft

import java.awt.image.BufferedImage

import graft.functions.{Apng, ImageOps, VideoContainers}
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** X1 — REAL animated-PNG decode: the JDK has no APNG support, so the
  * acTL/fcTL/fdAT walk, per-frame PNG synthesis, CRC verification, and
  * blend/dispose compositing are all this module's — spec'd against
  * hand-placed patches, both stream shapes, and the q42 fixture. */
class ApngSpec extends AnyFunSuite {

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

  test("the JDK alone is NOT enough: ImageIO sees only the default image") {
    // this is the gap the module closes — prove it stays a gap
    val bytes = FixtureGen.apngBytes(2L) // 3 frames
    assert(ImageOps.decode(bytes) != null) // a valid plain PNG to the JDK
    assert(Apng.frameCount(bytes) == 3)
    assert(Apng.sampleFramesIndexed(bytes, Int.MaxValue).length == 3)
  }

  test("fixture frames round-trip EXACTLY in BOTH stream shapes (PNG is lossless)") {
    (0L until 10L).foreach { d => // even: default-image-as-frame-0; odd: excluded
      val bytes = FixtureGen.apngBytes(d)
      val frames = Apng.sampleFramesIndexed(bytes, Int.MaxValue)
      assert(frames.length == (d % 3).toInt + 1, s"doc $d")
      frames.foreach { case (k, img) =>
        assert(img.getWidth == 16 && img.getHeight == 16, s"doc $d frame $k")
        val expected = (14 + (41 * d + 17 * k) % 230).toInt
        (0 until 16).foreach(y => (0 until 16).foreach(x =>
          assert(grayAt(img, x, y) == expected, s"doc $d frame $k ($x,$y)")))
      }
      assert(VideoContainers.sampleFramesIndexed(bytes, 2).nonEmpty, s"doc $d")
    }
  }

  test("frames are PATCHES: offsets composite; blend=source replaces the rect") {
    val bytes = Apng.encodeApng(Seq(
      (uniform(8, 8, 50), 0, 0, 0, 0),
      (uniform(4, 4, 200), 2, 2, 0, 0))) // blend 0 = source
    val frames = Apng.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(frames.map(_._1) == Seq(0, 1))
    val f1 = frames(1)._2
    assert(f1.getWidth == 8 && f1.getHeight == 8)
    assert(grayAt(f1, 0, 0) == 50 && grayAt(f1, 7, 7) == 50)
    assert(grayAt(f1, 2, 2) == 200 && grayAt(f1, 5, 5) == 200)
    assert(grayAt(f1, 1, 1) == 50 && grayAt(f1, 6, 6) == 50)
  }

  test("dispose=background clears the rect; dispose=previous rolls back") {
    val bg = Apng.sampleFramesIndexed(Apng.encodeApng(Seq(
      (uniform(8, 8, 50), 0, 0, 0, 0),
      (uniform(4, 4, 200), 2, 2, 1, 0), // dispose 1 = background
      (uniform(2, 2, 99), 0, 0, 0, 0))), Int.MaxValue)
    assert(grayAt(bg(1)._2, 3, 3) == 200)
    assert(alphaAt(bg(2)._2, 3, 3) == 0, "disposed rect must be cleared")
    assert(grayAt(bg(2)._2, 0, 0) == 99)
    assert(grayAt(bg(2)._2, 7, 7) == 50 && alphaAt(bg(2)._2, 7, 7) == 255)

    val prev = Apng.sampleFramesIndexed(Apng.encodeApng(Seq(
      (uniform(8, 8, 50), 0, 0, 0, 0),
      (uniform(4, 4, 200), 2, 2, 2, 0), // dispose 2 = previous
      (uniform(2, 2, 99), 0, 0, 0, 0))), Int.MaxValue)
    assert(grayAt(prev(1)._2, 3, 3) == 200)
    assert(grayAt(prev(2)._2, 3, 3) == 50, "patch must be rolled back")
    assert(grayAt(prev(2)._2, 0, 0) == 99)
  }

  test("default-image-excluded shape: IDAT pixels never reach the animation") {
    // the default image is gray 50 but the only ANIMATION frame is 200 —
    // a decoder that confused the shapes would emit two frames or gray 50
    val bytes = Apng.encodeApng(Seq(
      (uniform(8, 8, 50), 0, 0, 0, 0),
      (uniform(8, 8, 200), 0, 0, 0, 0)), defaultImageExcluded = true)
    val frames = Apng.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(frames.length == 2) // both entries ride fdAT in this shape
    assert(grayAt(frames(0)._2, 4, 4) == 50)
    assert(grayAt(frames(1)._2, 4, 4) == 200)
    assert(Apng.frameCount(bytes) == 2)
  }

  test("sampling is floor-spaced with SOURCE indices, like the rest of the family") {
    val frames = (0 until 10).map(k =>
      (uniform(4, 4, 20 + k), 0, 0, 0, 0): Apng.Placed)
    val sampled = Apng.sampleFramesIndexed(Apng.encodeApng(frames), 4)
    assert(sampled.map(_._1) == Seq(0, 2, 5, 7))
    sampled.foreach { case (k, img) => assert(grayAt(img, 0, 0) == 20 + k) }
  }

  test("CRC verification: a flipped bit classifies; plain PNGs are not animations") {
    val bytes = FixtureGen.apngBytes(4L)
    val flipped = bytes.clone()
    flipped(bytes.length / 2) = (flipped(bytes.length / 2) ^ 0x08).toByte
    assert(Apng.sampleFramesIndexed(flipped, 4).isEmpty)
    val plain = ImageOps.encode(uniform(8, 8, 60), "png")
    assert(!Apng.isApng(plain))
    assert(Apng.sampleFramesIndexed(plain, 4).isEmpty)
    assert(VideoContainers.sampleFramesIndexed(plain, 4).isEmpty)
  }

  test("hostile payloads classify: bombs, truncation, out-of-canvas fcTL, garbage") {
    val bytes = FixtureGen.apngBytes(1L)
    (1 to 60 by 9).foreach(c =>
      assert(Apng.sampleFramesIndexed(bytes.dropRight(c), 4).isEmpty, s"cut $c"))
    assert(Apng.sampleFramesIndexed(null, 4).isEmpty)
    assert(Apng.sampleFramesIndexed("PNG".getBytes("ISO-8859-1"), 4).isEmpty)
    // a claimed 65535x65535 canvas must never allocate (CRC-fixed patch)
    // — easiest hostile build: re-wrap the real chunks with a huge IHDR
    intercept[IllegalArgumentException] { // encoder rejects out-of-canvas patches
      Apng.encodeApng(Seq(
        (uniform(8, 8, 50), 0, 0, 0, 0),
        (uniform(4, 4, 200), 6, 6, 0, 0)))
    }
  }
}
