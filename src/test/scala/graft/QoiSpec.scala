package graft

import graft.functions.{ImageOps, Qoi}
import graft.fixtures.FixtureGen

/** X1 — REAL decode for the QOI image format: op-stream semantics pinned
  * by HAND-ASSEMBLED chunk streams (independent of the encoder), wrapping
  * arithmetic, the running-index contract, round-trips, fixture closed
  * form, the ImageOps magic-sniff dispatch, and malformed-payload
  * classification. */
class QoiSpec extends SparkSpec {

  private def header(w: Int, h: Int, ch: Int): Array[Byte] =
    Array[Byte]('q', 'o', 'i', 'f',
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      ch.toByte, 0)

  private val marker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  private def argb(img: java.awt.image.BufferedImage): Seq[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth).toSeq

  test("hand-assembled stream: every op family decodes to the spec's pixels") {
    // 2×3, chunks written by hand (no encoder involvement):
    //   RGB(10,20,30) → DIFF(+1,0,−1) → RUN(1) → LUMA(dg+5, dr−2, db+3)
    //   → RGBA(200,100,50,128) → INDEX(slot 9 = the first pixel)
    val chunks = Array[Byte](
      0xfe.toByte, 10, 20, 30,
      0x79, // 0x40 | (3<<4) | (2<<2) | 1
      0xc0.toByte, // run of 1 more
      0xa5.toByte, 0x6b, // 0x80|(5+32), (6<<4)|11
      0xff.toByte, 200.toByte, 100, 50, 128.toByte,
      0x09) // (10·3 + 20·5 + 30·7 + 255·11) % 64 = 9
    val img = Qoi.decode(header(2, 3, 4) ++ chunks ++ marker)
    assert(img != null && img.getWidth == 2 && img.getHeight == 3)
    def p(a: Int, r: Int, g: Int, b: Int) = (a << 24) | (r << 16) | (g << 8) | b
    assert(argb(img) == Seq(
      p(255, 10, 20, 30), p(255, 11, 20, 29),
      p(255, 11, 20, 29), p(255, 14, 25, 37),
      p(128, 200, 100, 50), p(255, 10, 20, 30)))
  }

  test("DIFF and LUMA wrap modulo 256 (the spec's wrapping byte math)") {
    // RGB(255,0,128) then DIFF(+1,−2,+1): r 255→0, g 0→254 — both wrap
    val s1 = header(2, 1, 3) ++ Array[Byte](0xfe.toByte, 255.toByte, 0, 128.toByte,
      0x73) ++ marker // 0x40 | (3<<4) | (0<<2) | 3
    val i1 = Qoi.decode(s1)
    assert(argb(i1).map(_ & 0xffffff) == Seq(0xff0080, 0x00fe81))
    // RGB(3,2,250) then LUMA(dg=+10, dr_dg=−8, db_dg=+7): r 3+2=5,
    // g 2+10=12, b 250+17 wraps to 11
    val s2 = header(2, 1, 3) ++ Array[Byte](0xfe.toByte, 3, 2, 250.toByte,
      (0x80 | 42).toByte, ((0 << 4) | 15).toByte) ++ marker
    val i2 = Qoi.decode(s2)
    assert(argb(i2).map(_ & 0xffffff) == Seq(0x0302fa, 0x050c0b))
  }

  test("running index: alpha participates in the hash; RUN re-stores nothing new") {
    // RGBA(10,20,30,128) hashes to slot (30+100+210+1408)%64 = 20 — an
    // INDEX of slot 20 after other chunks must return the RGBA value
    val s = header(3, 1, 4) ++ Array[Byte](
      0xff.toByte, 10, 20, 30, 128.toByte,
      0xfe.toByte, 90, 90, 90, // new color (alpha stays 128)
      20) ++ marker // INDEX slot 20
    val img = Qoi.decode(s)
    assert(argb(img) == Seq(0x800a141e, 0x805a5a5a, 0x800a141e))
  }

  test("encode → decode round-trip is exact on seeded arbitrary images, 3 and 4 channel") {
    val rnd = new scala.util.Random(45)
    (0 until 60).foreach { t =>
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(20)
      val px = Array.fill(w * h)(rnd.nextInt()) // arbitrary ARGB incl. alpha
      val four = Qoi.decode(Qoi.encode(px, w, h, channels = 4))
      assert(four.getRGB(0, 0, w, h, null, 0, w).toSeq == px.toSeq, s"t=$t 4ch")
      val three = Qoi.decode(Qoi.encode(px, w, h, channels = 3))
      assert(three.getRGB(0, 0, w, h, null, 0, w).toSeq ==
        px.map(v => 0xff000000 | (v & 0xffffff)).toSeq, s"t=$t 3ch")
    }
  }

  test("fixture: closed form holds through the ImageOps dispatch; all op families on the wire") {
    var hist = Map.empty[String, Int].withDefaultValue(0)
    (0L until 20L).foreach { d =>
      val bytes = FixtureGen.qoiBytes(d)
      Qoi.opHistogram(bytes).foreach { case (k, v) => hist += (k -> (hist(k) + v)) }
      val img = ImageOps.decode(bytes) // the sniffing dispatch, not Qoi.decode
      assert(img != null && img.getWidth == 16 && img.getHeight == 16, s"doc $d")
      val a = (30 + (29 * d) % 180).toInt
      val px = img.getRGB(0, 0, 16, 16, null, 0, 16)
      (0 until 256).foreach { i =>
        val x = i % 16; val y = i / 16
        val v = (a + 5 * (y / 4) + x * (y % 3)) % 256
        assert((px(i) & 0xffffff) == ((v << 16) | (v << 8) | v), s"doc $d px $i")
      }
    }
    // the fixture's row structure guarantees RUN/DIFF/LUMA; the header
    // jump guarantees literals; repeated row-start colors guarantee INDEX
    Seq("run", "diff", "luma", "index", "rgb").foreach { op =>
      assert(hist(op) > 0, s"op family $op never on the wire: $hist")
    }
  }

  test("phash/resize/validate pipeline functions work on QOI payloads") {
    val bytes = FixtureGen.qoiBytes(2L)
    assert(ImageOps.phash64(bytes) != 0L)
    val resized = ImageOps.resizeBox(bytes, 8, 8, "png")
    val r = ImageOps.decode(resized)
    assert(r.getWidth == 8 && r.getHeight == 8)
    // lossless: QOI-of-synthetic vs PNG-of-synthetic is pixel-identical
    val px = ImageOps.syntheticPixels(7L, 16, 16)
    val qoi = Qoi.encode(px, 16, 16)
    assert(ImageOps.psnrDb(qoi, ImageOps.encode(ImageOps.toImage(px, 16, 16), "png")) == 999.0)
  }

  test("decoder registry: qoi is registered lossless; encode side round-trips") {
    val d = graft.sources.DecoderRegistry.get("qoi")
    assert(d.lossless)
    assert(graft.sources.DecoderRegistry.losslessFormats.contains("qoi"))
    val img = ImageOps.toImage(ImageOps.syntheticPixels(3L, 12, 9), 12, 9)
    val back = d.decode(d.encode(img))
    assert(argb(back) == argb(img))
  }

  test("malformed payloads classify (null), never throw") {
    assert(Qoi.decode(null) == null)
    assert(Qoi.decode(Array.emptyByteArray) == null)
    assert(Qoi.decode("qoif".getBytes) == null) // header cut short
    val good = FixtureGen.qoiBytes(0L)
    assert(Qoi.decode(good.dropRight(1)) == null) // marker truncated
    assert(Qoi.decode(good.dropRight(30)) == null) // chunk stream truncated
    val badMagic = good.clone(); badMagic(0) = 'x'
    assert(Qoi.decode(badMagic) == null)
    val badCh = good.clone(); badCh(12) = 5
    assert(Qoi.decode(badCh) == null)
    // decompression bomb: a RUN-heavy payload claiming 2^31 pixels must
    // refuse by geometry, not allocate
    val bomb = header(1 << 15, 1 << 16, 3) ++ Array[Byte](0xfe.toByte, 1, 2, 3) ++ marker
    assert(Qoi.decode(bomb) == null)
    // zero geometry
    assert(Qoi.decode(header(0, 4, 3) ++ marker) == null)
    // random mutation sweep: any outcome but a throw
    val rnd = new scala.util.Random(46)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Qoi.decode(m) // null or an image — both fine
    }
  }
}
