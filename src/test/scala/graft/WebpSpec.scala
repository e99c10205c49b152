package graft

import graft.functions.{ImageOps, Webp}
import graft.functions.Webp.WebpOptions
import graft.fixtures.FixtureGen

/** X1 — REAL decode for WebP lossless (VP8L, RFC 9649): the derived
  * short-distance neighbor map pinned against the RFC's literal table,
  * exact round-trips through every transform family / prefix-code form /
  * cache size, wire-level feature histograms for the fixture corpus, the
  * ImageOps magic-sniff dispatch, lossy-WebP classification, and
  * malformed-payload / decompression-bomb discipline. */
class WebpSpec extends SparkSpec {

  private def argb(img: java.awt.image.BufferedImage): Seq[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth).toSeq

  private def roundTrip(px: Array[Int], w: Int, h: Int, opts: WebpOptions,
      label: String): Unit = {
    val img = Webp.decode(Webp.encode(px, w, h, opts))
    assert(img != null, s"$label: decode returned null")
    assert(img.getWidth == w && img.getHeight == h, s"$label: geometry")
    assert(argb(img) == px.toSeq, s"$label: pixels differ")
  }

  test("short-distance map: the closed-form derivation reproduces RFC 9649's FULL literal table") {
    // the RFC lists all 120 (dx, dy) pairs literally — pinned in full so a
    // derivation drift anywhere (head OR tail) fails the suite. dx spans
    // -7..8 (libwebp packs dx as the nibble 8-dx, so -8 is unrepresentable).
    val rfc = Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
      (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
      (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
      (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
      (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
      (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
      (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
      (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
    assert(rfc.length == 120)
    val derived = Webp.DistMap.toSeq.map(p => ((p & 0xff) - 8, p >> 8))
    assert(derived.length == 120)
    derived.zip(rfc).zipWithIndex.foreach { case ((d, r), i) =>
      assert(d == r, s"distance code ${i + 1}: derived $d, RFC $r")
    }
    // the tail anchors the r05 review flagged: codes 97/102/103/119/120
    assert(derived(96) == ((8, 0)) && derived(101) == ((8, 1)) &&
      derived(102) == ((8, 2)) && derived(118) == ((8, 6)) &&
      derived(119) == ((8, 7)))
  }

  /** LSB-first bit packing, the VP8L convention — (value, nbits) fields. */
  private def packBits(fields: Seq[(Int, Int)]): Array[Byte] = {
    val bits = fields.flatMap { case (v, n) => (0 until n).map(i => (v >> i) & 1) }
    bits.grouped(8)
      .map(g => g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte)
      .toArray
  }

  test("normal-form prefix code with exactly ONE used symbol is a valid 0-bit code") {
    // libwebp's encoder emits these (ClearHuffmanTreeIfOnlyOneSymbol) and
    // its decoder special-cases them (BuildHuffmanTable "code with only one
    // value"); rejecting them misclassifies real-world lossless WebPs.
    // Transmission: normal form, cl code over {0, 1}, max_symbol = 6,
    // lengths (0, 0, 0, 0, 0, 1) — symbol 5 is the lone user.
    val tx = packBits(Seq(
      (0, 1), // normal (code-length-coded) form
      (0, 4), // numCl = 4 → cl lengths follow order (17, 18, 0, 1)
      (0, 3), (0, 3), (1, 3), (1, 3),
      (1, 1), (1, 3), (4, 4), // use max_symbol; nbits = 4; m = 2 + 4 = 6
      (0, 1), (0, 1), (0, 1), (0, 1), (0, 1), (1, 1)))
    assert(Webp.readPrefixCodeForTest(tx, 280, 3) == Seq(5, 5, 5))
  }

  test("an incomplete multi-symbol normal-form code still classifies as malformed") {
    // two symbols at length 2 under-subscribe the Kraft sum — the hostile
    // stream rejection the single-symbol special case must NOT relax.
    val tx = packBits(Seq(
      (0, 1),
      (1, 4), // numCl = 5 → order (17, 18, 0, 1, 2)
      (0, 3), (0, 3), (1, 3), (0, 3), (1, 3),
      (1, 1), (1, 3), (4, 4), // max_symbol = 6
      (0, 1), (0, 1), (0, 1), (1, 1), (0, 1), (1, 1))) // lens(3) = lens(5) = 2
    assert(Webp.readPrefixCodeForTest(tx, 280, 1) == null)
  }

  test("round-trip is exact on seeded arbitrary ARGB images across every transform family") {
    val rnd = new scala.util.Random(47)
    (0 until 25).foreach { t =>
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(24)
      val px = Array.fill(w * h)(rnd.nextInt()) // arbitrary, alpha included
      roundTrip(px, w, h, WebpOptions(), s"t=$t plain")
      roundTrip(px, w, h, WebpOptions(subtractGreen = true), s"t=$t sg")
      roundTrip(px, w, h, WebpOptions(cacheBits = 8), s"t=$t cache8")
      roundTrip(px, w, h, WebpOptions(lz77 = false), s"t=$t nolz")
      roundTrip(px, w, h, WebpOptions(predictorMode = t % 14, predictorBits = 2 + t % 8),
        s"t=$t pred${t % 14}")
      roundTrip(px, w, h, WebpOptions(colorTransform = true, colorBits = 2 + t % 8,
        greenToRed = rnd.nextInt(256) - 128, greenToBlue = rnd.nextInt(256) - 128,
        redToBlue = rnd.nextInt(256) - 128), s"t=$t color")
      roundTrip(px, w, h, WebpOptions(subtractGreen = true, predictorMode = 13 - t % 14,
        colorTransform = true, greenToRed = 33, greenToBlue = -70, redToBlue = 5,
        cacheBits = 1 + t % 11), s"t=$t stacked")
    }
  }

  test("predictor sweep: all 14 modes round-trip one fixed image, odd geometry") {
    val rnd = new scala.util.Random(48)
    val w = 19; val h = 11
    val px = Array.fill(w * h)(rnd.nextInt())
    (0 to 13).foreach(m =>
      roundTrip(px, w, h, WebpOptions(predictorMode = m, predictorBits = 3), s"mode $m"))
  }

  test("palette path round-trips at every sub-byte bundling width") {
    val rnd = new scala.util.Random(49)
    // palette sizes straddling the width-bits breakpoints: 3 bits (≤2),
    // 2 (≤4), 1 (≤16), 0 (≤256); odd width exercises the bundle tail
    Seq(2, 3, 4, 5, 16, 17, 200, 256).foreach { k =>
      val colors = Array.fill(k)(rnd.nextInt())
      val w = 13; val h = 9
      // force all k colors onto the canvas so the palette is exactly k
      val px = Array.tabulate(w * h)(i => colors(if (i < k) i else rnd.nextInt(k)))
      roundTrip(px, w, h, WebpOptions(palette = true), s"palette $k")
      roundTrip(px, w, h, WebpOptions(palette = true, lz77 = false, cacheBits = 4),
        s"palette $k nolz cache")
    }
  }

  test("simple prefix-code forms: 1- and 2-color images (zero- and one-bit symbols)") {
    // constant image: every channel code is a single symbol (0-bit reads)
    roundTrip(Array.fill(40)(0xff102030), 8, 5, WebpOptions(lz77 = false), "const")
    // two colors chosen so some channels share a symbol and some don't
    val px = Array.tabulate(35)(i => if (i % 3 == 0) 0xff0a0b0c else 0x80f0e0d0)
    roundTrip(px, 7, 5, WebpOptions(lz77 = false), "two-color")
    // ...and with LZ77 runs + cache on top of the simple codes
    roundTrip(Array.fill(64)(0xdeadbeef), 8, 8, WebpOptions(cacheBits = 2), "const lz")
  }

  test("color-cache sweep: every legal cache size round-trips") {
    val rnd = new scala.util.Random(50)
    val px = Array.fill(18 * 7)(Array(0xff112233, 0xff445566, 0x11223344,
      0xffeeddcc)(rnd.nextInt(4)))
    (1 to 11).foreach(b =>
      roundTrip(px, 18, 7, WebpOptions(cacheBits = b), s"cache $b"))
  }

  test("LZ77 rides both the direct and the 2-D neighbor-map distance forms") {
    // rows repeat → row-copy tokens at distance = width; width 9 means
    // distance 9 sits INSIDE the neighbor map ((0,1) slot via xsize)
    val row = Array.tabulate(9)(x => 0xff000000 | (x * 7 << 16) | (x << 3))
    val px = Array.tabulate(9 * 12)(i => row(i % 9))
    val bytes = Webp.encode(px, 9, 12, WebpOptions())
    val hist = Webp.opHistogram(bytes)
    assert(hist("map_copy") > 0, s"neighbor-map copies never on the wire: $hist")
    roundTrip(px, 9, 12, WebpOptions(), "row copies")
    // a long flat run longer than one row still reconstructs exactly
    val flat = Array.fill(300 * 10)(0xff606060)
    roundTrip(flat, 300, 10, WebpOptions(), "long run")
    val flatHist = Webp.opHistogram(Webp.encode(flat, 300, 10, WebpOptions()))
    assert(flatHist("copy") + flatHist("map_copy") > 0, s"no copies: $flatHist")
  }

  test("fixture: closed form holds through the ImageOps dispatch; every transform family and token kind on the wire") {
    var hist = Map.empty[String, Int].withDefaultValue(0)
    (0L until 24L).foreach { d =>
      val bytes = FixtureGen.webpBytes(d)
      Webp.opHistogram(bytes).foreach { case (k, v) => hist += (k -> (hist(k) + v)) }
      val img = ImageOps.decode(bytes) // the sniffing dispatch, not Webp.decode
      assert(img != null && img.getWidth == 21 && img.getHeight == 13, s"doc $d")
      val a = (20 + (29 * d) % 170).toInt
      val px = img.getRGB(0, 0, 21, 13, null, 0, 21)
      (0 until 21 * 13).foreach { i =>
        val x = i % 21; val y = i / 21
        val v = (a + 5 * (y / 4) + x * (y % 3)) % 256
        assert((px(i) & 0xffffff) == ((v << 16) | (v << 8) | v), s"doc $d px $i")
      }
    }
    // the %6 option cycle guarantees every transform family; the formula's
    // constant rows guarantee copies; the cache variants guarantee hits
    Seq("literal", "copy", "cache", "t_pred", "t_color", "t_subgreen", "t_index")
      .foreach(op => assert(hist(op) > 0, s"feature $op never on the wire: $hist"))
  }

  test("phash/resize/validate pipeline functions work on WebP payloads") {
    val bytes = FixtureGen.webpBytes(2L)
    assert(ImageOps.phash64(bytes) != 0L)
    val resized = ImageOps.resizeBox(bytes, 8, 8, "png")
    val r = ImageOps.decode(resized)
    assert(r.getWidth == 8 && r.getHeight == 8)
    // lossless: WebP-of-synthetic vs PNG-of-synthetic is pixel-identical
    val px = ImageOps.syntheticPixels(7L, 16, 16)
    val webp = Webp.encode(px, 16, 16, WebpOptions(subtractGreen = true, cacheBits = 6))
    assert(ImageOps.psnrDb(webp, ImageOps.encode(ImageOps.toImage(px, 16, 16), "png")) == 999.0)
  }

  test("decoder registry: webp is registered lossless; encode side round-trips") {
    val d = graft.sources.DecoderRegistry.get("webp")
    assert(d.lossless)
    assert(graft.sources.DecoderRegistry.losslessFormats.contains("webp"))
    val img = ImageOps.toImage(ImageOps.syntheticPixels(3L, 12, 9), 12, 9)
    val back = d.decode(d.encode(img))
    assert(argb(back) == argb(img))
  }

  test("lossy WebP (VP8/VP8X) classifies as undecodable, not a throw or a wrong image") {
    // a structurally valid RIFF/WEBP container whose payload is VP8 lossy
    val payload = Array.fill[Byte](40)(0x5a)
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    def le32(v: Int): Unit = { out.write(v); out.write(v >> 8); out.write(v >> 16); out.write(v >> 24) }
    tag("RIFF"); le32(4 + 8 + payload.length); tag("WEBP")
    tag("VP8 "); le32(payload.length); out.write(payload, 0, payload.length)
    val lossy = out.toByteArray
    assert(Webp.isWebp(lossy)) // the sniff claims the container...
    assert(Webp.decode(lossy) == null) // ...and decode classifies honestly
    assert(ImageOps.decode(lossy) == null)
  }

  test("malformed payloads classify (null), never throw") {
    assert(Webp.decode(null) == null)
    assert(Webp.decode(Array.emptyByteArray) == null)
    assert(Webp.decode("RIFF".getBytes) == null)
    val good = FixtureGen.webpBytes(1L)
    // dropping k=1 may only shave the RIFF pad byte (still decodable);
    // any deeper cut truncates the VP8L payload and must classify
    (2 to 12).foreach(k => assert(Webp.decode(good.dropRight(k)) == null,
      s"truncate $k")) // chunk-size check or bit reader refuses, no wrap
    assert(Webp.decode(good.take(20)) == null)
    val badMagic = good.clone(); badMagic(8) = 'X'
    assert(Webp.decode(badMagic) == null)
    // chunk size larger than the container
    val badSize = good.clone(); badSize(16) = -1; badSize(17) = -1
    assert(Webp.decode(badSize) == null)
    // decompression bomb: a handful of bytes claiming a 16383×16383
    // canvas must refuse by geometry before any allocation
    val bw = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = s.foreach(c => bw.write(c))
    def le32(v: Int): Unit = { bw.write(v); bw.write(v >> 8); bw.write(v >> 16); bw.write(v >> 24) }
    val claim = Array[Byte](0x2f, -1, -1, -1, -1, 0, 0, 0) // 16384×16384 header
    tag("RIFF"); le32(4 + 8 + claim.length); tag("WEBP"); tag("VP8L"); le32(claim.length)
    bw.write(claim, 0, claim.length)
    assert(Webp.decode(bw.toByteArray) == null)
    // random mutation sweep: any outcome but a throw (and any produced
    // image stays inside the canvas cap)
    val rnd = new scala.util.Random(51)
    val corpus = (0L until 6L).map(FixtureGen.webpBytes)
    (0 until 400).foreach { _ =>
      val m = corpus(rnd.nextInt(corpus.length)).clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val img = Webp.decode(m) // null or an image — both fine
      if (img != null) assert(img.getWidth.toLong * img.getHeight <= (1L << 22))
    }
  }
}
