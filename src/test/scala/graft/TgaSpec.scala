package graft

import graft.functions.Tga
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** X1 — REAL TGA decode: the JDK has no reader, so the header walk,
  * palette/truecolor/grayscale raw+RLE types, and both origin flips are
  * all this module's — spec'd against the q51 fixture, a hand-built
  * 16-bit image, RLE packet edges, and hostile payloads. TGA has no
  * magic bytes, so dispatch is registry-fmt-driven (also spec'd). */
class TgaSpec extends AnyFunSuite {

  test("fixture decodes to the quadrant closed form across EVERY wire type") {
    (0L until 12L).foreach { d => // d%6 cycles types; parity flips origin
      val img = Tga.decode(FixtureGen.tgaBytes(d))
      assert(img != null, s"doc $d")
      assert(img.getWidth == 17 && img.getHeight == 10, s"doc $d dims")
      val ga = (28 + (41 * d) % 200).toInt
      val gb = (12 + (53 * d) % 228).toInt
      (0 until 10).foreach(y => (0 until 17).foreach { x =>
        val p = img.getRGB(x, y)
        val expect = if ((x < 8) == (y < 5)) ga else gb
        assert((p >>> 24) == 0xff && (p & 0xff) == expect &&
          ((p >> 8) & 0xff) == expect, s"doc $d ($x,$y)")
      })
    }
  }

  test("origin flips: the same pixels round-trip through all four descriptor corners") {
    val px = Array.tabulate(6 * 4)(i => 0xff000000 | ((i * 9 + 10) % 256) * 0x010101)
    for {
      td <- Seq(true, false)
      rtl <- Seq(true, false)
    } {
      val img = Tga.decode(Tga.encode(px, 6, 4, imgType = 2, depth = 24,
        topDown = td, rightToLeft = rtl))
      assert(img != null, s"td=$td rtl=$rtl")
      (0 until 24).foreach(i => assert(
        (img.getRGB(i % 6, i / 6) & 0xffffff) == (px(i) & 0xffffff),
        s"td=$td rtl=$rtl px $i"))
    }
  }

  test("32-bit alpha survives decode exactly") {
    val px = Array.tabulate(4 * 4)(i => ((i * 16 + 3) << 24) | 0x406080)
    val img = Tga.decode(Tga.encode(px, 4, 4, imgType = 2, depth = 32))
    (0 until 16).foreach(i =>
      assert(img.getRGB(i % 4, i / 4) == px(i), s"px $i"))
  }

  test("16-bit ARGB1555 decodes with 5-bit channel expansion (hand-built bytes)") {
    // header: type 2, 16 bpp, 2x1, top-down; pixels: pure red 31, mid gray 16
    val red = (31 << 10).toShort
    val gray = ((16 << 10) | (16 << 5) | 16).toShort
    val bytes = Array[Byte](0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 1, 0, 16, 0x20,
      (red & 0xff).toByte, ((red >> 8) & 0xff).toByte,
      (gray & 0xff).toByte, ((gray >> 8) & 0xff).toByte)
    val img = Tga.decode(bytes)
    assert(img != null && img.getWidth == 2 && img.getHeight == 1)
    assert(img.getRGB(0, 0) == 0xffff0000) // 31/31 -> 255
    val mid = 16 * 255 / 31 // 131
    assert(img.getRGB(1, 0) == (0xff000000 | (mid << 16) | (mid << 8) | mid))
  }

  test("depth-15 truecolor decodes like 16 (legacy writers emit it)") {
    val red = (31 << 10).toShort
    val bytes = Array[Byte](0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 15, 0x20,
      (red & 0xff).toByte, ((red >> 8) & 0xff).toByte)
    val img = Tga.decode(bytes)
    assert(img != null && img.getRGB(0, 0) == 0xffff0000)
  }

  test("reserved color-map types and legacy interleave bits classify, not scramble") {
    val px = Array.fill(4 * 4)(0xff101010)
    val ok = Tga.encode(px, 4, 4, imgType = 2, depth = 24)
    val badCm = ok.clone(); badCm(1) = 2 // reserved cmType
    assert(Tga.decode(badCm) == null)
    val interleaved = ok.clone()
    interleaved(17) = (interleaved(17) | 0x40).toByte // two-way interleave
    assert(Tga.decode(interleaved) == null)
  }

  test("encoded RLE packets never cross scan lines (spec conformance)") {
    // the quadrant fixture has same-color spans that CONTINUE across row
    // boundaries — walk the packet stream and assert each packet ends
    // within the row it started in
    Seq(2L, 4L).foreach { d => // the RLE fixture variants
      val bytes = FixtureGen.tgaBytes(d)
      val bpp = if (d % 6 == 4) 1 else 3 // palette-RLE vs truecolor-RLE
      val palBytes = if (d % 6 == 4) 3 * ((bytes(5) & 0xff) | ((bytes(6) & 0xff) << 8)) else 0
      var p = 18 + palBytes
      var i = 0
      while (i < 17 * 10) {
        val packet = bytes(p) & 0xff; p += 1
        val count = (packet & 0x7f) + 1
        assert(i / 17 == (i + count - 1) / 17,
          s"doc $d: packet at pixel $i (count $count) crosses a scan line")
        if ((packet & 0x80) != 0) p += bpp else p += bpp * count
        i += count
      }
    }
  }

  test("J7 gate path: fmt-aware decode validates a signature-less tga row") {
    import graft.functions.ImageOps
    val (w, h) = (16, 12)
    val synth = ImageOps.syntheticPixels(7L, w, h)
    val tga = Tga.encode(synth, w, h, imgType = 2, depth = 32)
    // the magic sniff alone cannot route this...
    assert(ImageOps.decode(tga) == null || ImageOps.decode(tga).getWidth != w)
    // ...but the gate's fmt-aware decode must, and losslessly
    assert(ImageOps.psnrVsSyntheticFmt(tga, "tga", 7L, w, h) == 999.0)
    assert(ImageOps.psnrVsSyntheticFmt(tga, null, 7L, w, h) == -1.0)
    assert(ImageOps.psnrVsSyntheticFmt(tga, "no-such-fmt", 7L, w, h) == -1.0)
  }

  test("RLE runs may not overrun the image; truncated packets classify") {
    val px = Array.fill(8 * 8)(0xff555555)
    val good = Tga.encode(px, 8, 8, imgType = 10, depth = 24)
    assert(Tga.decode(good) != null)
    // a run packet that would write past the last pixel
    val evil = good.clone()
    // find the first RLE packet byte (offset 18, no id/palette) and
    // inflate its count beyond the remaining pixels
    evil(18) = 0xff.toByte // run of 128 into an 8x8=64-px image
    assert(Tga.decode(evil) == null)
    (1 to 20 by 3).foreach(c => assert(Tga.decode(good.dropRight(c)) == null, s"cut $c"))
  }

  test("registry: tga is fmt-dispatched (no magic bytes), lossless, round-trips") {
    val dec = graft.sources.DecoderRegistry.get("tga")
    assert(dec.lossless)
    val px = Array.tabulate(5 * 5)(i => 0xff000000 | ((i * 11) % 256) * 0x010101)
    val rt = dec.decode(dec.encode(graft.functions.ImageOps.toImage(px, 5, 5)))
    assert(rt != null && (0 until 25).forall(i =>
      (rt.getRGB(i % 5, i / 5) & 0xffffff) == (px(i) & 0xffffff)))
  }

  test("hostile payloads classify: garbage, bad types/depths, palette bombs, null") {
    assert(Tga.decode(null) == null)
    assert(Tga.decode(Array.fill(17)(7.toByte)) == null)
    val px = Array.fill(4 * 4)(0xff101010)
    val ok = Tga.encode(px, 4, 4, imgType = 2, depth = 24)
    val badType = ok.clone(); badType(2) = 7 // image type 7 is undefined
    assert(Tga.decode(badType) == null)
    val badDepth = ok.clone(); badDepth(16) = 13
    assert(Tga.decode(badDepth) == null)
    // a palette image whose index exceeds the map classifies
    val pal = Tga.encode(px, 4, 4, imgType = 1, depth = 8)
    val oob = pal.clone(); oob(oob.length - 1) = 200.toByte // 1-color palette
    assert(Tga.decode(oob) == null)
    // a header claiming 65535x65535 never allocates (bomb cap)
    val bomb = ok.clone()
    bomb(12) = 0xff.toByte; bomb(13) = 0xff.toByte
    bomb(14) = 0xff.toByte; bomb(15) = 0xff.toByte
    assert(Tga.decode(bomb) == null)
  }
}
