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

  test("fixture decodes to the quadrant closed form at EVERY member depth") {
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
        // quadrant form: varies along BOTH axes, so a bottom-up slip in
        // any depth's row walk fails here (the 11-row flip is asymmetric)
        val expect = if ((x < 9) == (y < 6)) ga else gb
        assert((p >>> 24) == 0xff, s"doc $d ($x,$y) alpha")
        assert((p & 0xff) == expect && ((p >> 8) & 0xff) == expect &&
          ((p >> 16) & 0xff) == expect, s"doc $d ($x,$y)")
      })
    }
  }

  test("selection trusts member HEADERS, not the lying directory entry") {
    // zero the decoy's entry w/h bytes: the TABLE now claims 256x256 for
    // the 6x5 member; real-world encoders lie exactly like this
    val bytes = FixtureGen.icoBytes(7L).clone()
    bytes(6) = 0; bytes(7) = 0 // entry 0 width/height bytes (0 claims 256)
    val img = Ico.decode(bytes)
    assert(img != null && img.getWidth == 18 && img.getHeight == 11,
      "the real 18x11 member must still win selection")
  }

  test("a corrupt tail entry is salvaged around, not fatal") {
    // break the SECOND entry's offset so its resource overruns EOF: the
    // decoy must still decode (truncated-tail favicons are common)
    val bytes = FixtureGen.icoBytes(8L).clone()
    val e1 = 6 + 16
    bytes(e1 + 12) = 0xff.toByte; bytes(e1 + 13) = 0xff.toByte
    bytes(e1 + 14) = 0xff.toByte; bytes(e1 + 15) = 0x7f.toByte
    val img = Ico.decode(bytes)
    assert(img != null && img.getWidth == 6 && img.getHeight == 5,
      "the intact decoy member must salvage the file")
  }

  test("a 32-bpp member whose AND plane was omitted decodes (alpha-superseded form)") {
    // PNG-to-ICO converters emit these: resource ends after the XOR plane
    val opaque = Ico.encode(Seq(Ico.Member(Array.fill(16)(0xff515151), 4, 4, 32)))
    val maskBytes = 4 * 4 // 4 rows x 4-byte AND stride
    val cut = opaque.dropRight(maskBytes).clone()
    // the single entry's size field must match the shortened resource
    val newSize = ((cut(6 + 8) & 0xff) | ((cut(6 + 9) & 0xff) << 8) |
      ((cut(6 + 10) & 0xff) << 16) | ((cut(6 + 11) & 0xff) << 24)) - maskBytes
    cut(6 + 8) = (newSize & 0xff).toByte; cut(6 + 9) = ((newSize >> 8) & 0xff).toByte
    cut(6 + 10) = ((newSize >> 16) & 0xff).toByte; cut(6 + 11) = ((newSize >> 24) & 0xff).toByte
    val img = Ico.decode(cut)
    assert(img != null && img.getWidth == 4)
    (0 until 16).foreach { i =>
      assert((img.getRGB(i % 4, i / 4) >>> 24) == 0xff, s"px $i opaque")
      assert((img.getRGB(i % 4, i / 4) & 0xff) == 0x51, s"px $i value")
    }
    // but a PALETTE member without its mask is genuinely malformed
    val pal = Ico.encode(Seq(Ico.Member(Array.fill(16)(0xff515151), 4, 4, 8)))
    val palCut = pal.dropRight(maskBytes).clone()
    val ps = ((palCut(6 + 8) & 0xff) | ((palCut(6 + 9) & 0xff) << 8) |
      ((palCut(6 + 10) & 0xff) << 16) | ((palCut(6 + 11) & 0xff) << 24)) - maskBytes
    palCut(6 + 8) = (ps & 0xff).toByte; palCut(6 + 9) = ((ps >> 8) & 0xff).toByte
    palCut(6 + 10) = ((ps >> 16) & 0xff).toByte; palCut(6 + 11) = ((ps >> 24) & 0xff).toByte
    assert(Ico.decode(palCut) == null)
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
    // tail truncation severs the (last) real member: decode must DEGRADE
    // to the intact 6x5 decoy — never return the damaged 18x11 member
    (1 to 60 by 7).foreach { c =>
      val img = Ico.decode(bytes.dropRight(c))
      assert(img != null && img.getWidth == 6 && img.getHeight == 5, s"cut $c")
    }
    // cutting into the DECOY too leaves nothing salvageable → null
    assert(Ico.decode(java.util.Arrays.copyOf(bytes, 6 + 32 + 8)) == null)
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
