package graft

import graft.functions.{Ico, ImageOps}
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** X1 — REAL ICO (favicon) decode: the JDK has no reader, so the
  * ICONDIR walk, DIB depths 1/4/8/24/32 with the AND transparency mask,
  * embedded-PNG members, and best-member selection are all this
  * module's — spec'd against the q50 fixture, hand-built masks, both
  * 32-bpp alpha conventions, and hostile payloads. */
class IcoSpec extends AnyFunSuite {

  test("fixture decodes to the two-column closed form at EVERY member depth") {
    (0L until 12L).foreach { d => // d%6 cycles 1/4/8/24/32 bpp + PNG member
      val bytes = FixtureGen.icoBytes(d)
      assert(Ico.isIco(bytes), s"doc $d")
      assert(Ico.imageCount(bytes) == 2, s"doc $d")
      val img = ImageOps.decode(bytes)
      assert(img != null, s"doc $d")
      // the 6x5 decoy is FIRST in the directory; selection must skip it
      assert(img.getWidth == 18 && img.getHeight == 11, s"doc $d best-member")
      val ga = (24 + (31 * d) % 200).toInt
      val gb = (16 + (37 * d) % 224).toInt
      (0 until 11).foreach(y => (0 until 18).foreach { x =>
        val p = img.getRGB(x, y)
        val expect = if (x < 9) ga else gb
        assert((p >>> 24) == 0xff, s"doc $d ($x,$y) alpha")
        assert((p & 0xff) == expect && ((p >> 8) & 0xff) == expect &&
          ((p >> 16) & 0xff) == expect, s"doc $d ($x,$y)")
      })
    }
  }

  test("the AND mask makes pixels transparent (palette and 24-bpp members)") {
    Seq(1, 4, 8, 24).foreach { depth =>
      // top-left quadrant transparent (alpha 0 drives the encoder's mask)
      val px = Array.tabulate(8 * 6) { i =>
        val x = i % 8; val y = i / 8
        if (x < 4 && y < 3) 0x00000000 else 0xff6e6e6e
      }
      val img = Ico.decode(Ico.encode(Seq(Ico.Member(px, 8, 6, depth))))
      assert(img != null, s"depth $depth")
      assert((img.getRGB(0, 0) >>> 24) == 0, s"depth $depth masked")
      assert((img.getRGB(5, 1) >>> 24) == 0xff, s"depth $depth opaque")
      assert((img.getRGB(5, 1) & 0xff) == 0x6e, s"depth $depth value")
    }
  }

  test("32-bpp: a real alpha channel WINS over the AND mask; an all-zero one defers to it") {
    // real alpha: semi-transparent pixels survive exactly
    val px = Array.tabulate(4 * 4)(i => ((40 + i * 10) << 24) | 0x808080)
    val withAlpha = Ico.decode(Ico.encode(Seq(Ico.Member(px, 4, 4, 32))))
    (0 until 16).foreach(i =>
      assert((withAlpha.getRGB(i % 4, i / 4) >>> 24) == 40 + i * 10, s"px $i"))
    // legacy pre-Vista shape: alpha plane all zero → the AND mask decides.
    // encoder output for all-transparent pixels sets every mask bit; the
    // decode must be fully transparent...
    val legacy = Ico.encode(Seq(Ico.Member(Array.fill(16)(0x00404040), 4, 4, 32)))
    val masked = Ico.decode(legacy)
    (0 until 16).foreach(i =>
      assert((masked.getRGB(i % 4, i / 4) >>> 24) == 0, s"masked px $i"))
    // ...and with the trailing AND-mask rows zeroed by hand, fully opaque
    // (the mask is the final andStride*h bytes of the last resource)
    val cleared = legacy.clone()
    (1 to 4 * 4).foreach(k => cleared(cleared.length - k) = 0) // 4 rows x 4-byte stride
    val opaque = Ico.decode(cleared)
    (0 until 16).foreach { i =>
      assert((opaque.getRGB(i % 4, i / 4) >>> 24) == 0xff, s"opaque px $i")
      assert((opaque.getRGB(i % 4, i / 4) & 0xff) == 0x40, s"opaque value $i")
    }
  }

  test("embedded PNG members decode through the JDK codec") {
    val px = Array.tabulate(10 * 7)(i => 0xff000000 | ((i * 3) % 256) * 0x010101)
    val img = Ico.decode(Ico.encode(Seq(Ico.Member(px, 10, 7, 0))))
    assert(img != null && img.getWidth == 10 && img.getHeight == 7)
    (0 until 70).foreach(i =>
      assert((img.getRGB(i % 10, i / 10) & 0xff) == (i * 3) % 256, s"px $i"))
  }

  test("best-member selection: largest area wins, then bit depth") {
    val small = Ico.Member(Array.fill(4 * 4)(0xff101010), 4, 4, 32)
    val big = Ico.Member(Array.fill(8 * 8)(0xff202020), 8, 8, 1)
    val byArea = Ico.decode(Ico.encode(Seq(small, big)))
    assert(byArea.getWidth == 8 && (byArea.getRGB(0, 0) & 0xff) == 0x20)
    val shallow = Ico.Member(Array.fill(4 * 4)(0xff303030), 4, 4, 4)
    val deep = Ico.Member(Array.fill(4 * 4)(0xff404040), 4, 4, 32)
    val byDepth = Ico.decode(Ico.encode(Seq(shallow, deep)))
    assert((byDepth.getRGB(0, 0) & 0xff) == 0x40)
  }

  test("registry: ico is registered lossless and round-trips through it") {
    val dec = graft.sources.DecoderRegistry.get("ico")
    assert(dec.lossless)
    val px = Array.tabulate(6 * 6)(i => 0xff000000 | (i * 7 % 256) * 0x010101)
    val rt = dec.decode(dec.encode(ImageOps.toImage(px, 6, 6)))
    assert(rt != null && (0 until 36).forall(i =>
      (rt.getRGB(i % 6, i / 6) & 0xffffff) == (px(i) & 0xffffff)))
  }

  test("hostile payloads classify: truncation, garbage, lying entries, depth bombs") {
    val bytes = FixtureGen.icoBytes(3L)
    (1 to 60 by 7).foreach(c =>
      assert(Ico.decode(bytes.dropRight(c)) == null, s"cut $c"))
    assert(Ico.decode(null) == null)
    assert(!Ico.isIco("\u0000\u0000\u0001\u0000junk".getBytes("ISO-8859-1")))
    assert(Ico.imageCount(Array.fill(40)(0.toByte)) == 0)
    // a DIB header claiming a huge geometry inside a tiny resource
    val bomb = bytes.clone()
    // real member's DIB starts after dir(6+32) + decoy; find it by the
    // biSize=40 LE marker scanning from the second entry's offset field
    val off = (bomb(6 + 16 + 12) & 0xff) | ((bomb(6 + 16 + 13) & 0xff) << 8)
    if ((bomb(off) & 0xff) == 40) { // DIB member (not the PNG variant)
      bomb(off + 4) = 0xff.toByte; bomb(off + 5) = 0xff.toByte // w = huge
      assert(Ico.decode(bomb) == null)
    }
    // PNG signature is not an ICO; a plain PNG never routes here
    val png = ImageOps.encode(ImageOps.toImage(Array.fill(16)(0xff808080), 4, 4), "png")
    assert(!Ico.isIco(png))
  }
}
