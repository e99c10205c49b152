package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageOps, Jpeg}

/** X1 — JPEG marker walk + EXIF TIFF-IFD metadata: SOF dims, camera
  * fields, and the has_gps PII-scrub signal over real JDK-encoded
  * JPEGs with spliced APP1 payloads. Malformed streams classify. */
class JpegSpec extends AnyFunSuite {

  private def jpeg(w: Int, h: Int, seed: Long = 7L): Array[Byte] =
    ImageOps.encode(ImageOps.toImage(ImageOps.syntheticPixels(seed, w, h), w, h), "jpg")

  private val spec = Jpeg.ExifSpec(orientation = 6, make = "Acme", model = "X100",
    dateTime = "2026:08:19 03:00:00", exifW = 4000, exifH = 3000, iso = 200,
    gps = false, littleEndian = true)

  test("both byte orders round-trip every field; SOF dims are the encoder's") {
    for (le <- Seq(true, false); gps <- Seq(true, false)) {
      val bytes = Jpeg.injectExif(jpeg(40, 28), spec.copy(littleEndian = le, gps = gps))
      val m = Jpeg.exifMeta(bytes).getOrElse(fail(s"le=$le gps=$gps"))
      assert(m.width == 40 && m.height == 28 && !m.progressive)
      assert(m.orientation == 6 && m.make == "Acme" && m.model == "X100")
      assert(m.dateTime == "2026:08:19 03:00:00")
      assert(m.exifWidth == 4000 && m.exifHeight == 3000 && m.iso == 200)
      assert(m.hasGps == gps)
    }
  }

  test("a plain JPEG (no APP1) still reports SOF dims with absent-field defaults") {
    val m = Jpeg.exifMeta(jpeg(33, 21)).getOrElse(fail("plain JPEG must parse"))
    assert(m.width == 33 && m.height == 21)
    assert(m.orientation == 0 && m.make == "" && m.dateTime == "")
    assert(m.exifWidth == -1 && m.iso == -1 && !m.hasGps)
  }

  test("inline ASCII values (count <= 4) read from the value slot, both orders") {
    for (le <- Seq(true, false)) {
      val m = Jpeg.exifMeta(Jpeg.injectExif(jpeg(16, 16),
        spec.copy(make = "abc", model = "xy", littleEndian = le))).get
      assert(m.make == "abc" && m.model == "xy")
    }
  }

  test("fill bytes before a marker are skipped per T.81") {
    val base = Jpeg.injectExif(jpeg(20, 20), spec)
    // splice two 0xFF fill bytes between SOI and the APP1
    val filled = base.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ base.drop(2)
    assert(Jpeg.exifMeta(filled).exists(_.orientation == 6))
  }

  test("non-JPEG and truncated payloads classify — never throw") {
    assert(Jpeg.exifMeta(null).isEmpty)
    assert(Jpeg.exifMeta(Array.fill(100)(0x55.toByte)).isEmpty)
    val bytes = Jpeg.injectExif(jpeg(24, 24), spec.copy(gps = true))
    var cut = 1
    while (cut < bytes.length) {
      Jpeg.exifMeta(bytes.take(cut)) // any outcome but a throw
      cut += 7
    }
  }

  test("hostile EXIF internals classify or degrade — lying offsets, huge counts") {
    val good = Jpeg.injectExif(jpeg(24, 24), spec)
    // the APP1 body starts at offset 2; TIFF header at 2+4+6
    val tiffAt = 2 + 4 + 6
    // lying IFD0 offset: points far past the APP1
    val badIfd = good.clone()
    badIfd(tiffAt + 4) = 0xff.toByte
    Jpeg.exifMeta(badIfd) // must not throw; fields degrade
    // huge entry count: bounded by MaxIfdEntries, not the declared value
    val badN = good.clone()
    badN(tiffAt + 8) = 0x7f.toByte
    val t0 = System.nanoTime()
    Jpeg.exifMeta(badN)
    assert(System.nanoTime() - t0 < 2e9)
    // lying segment length on the APP1 marker
    val badLen = good.clone()
    badLen(4) = 0x7f.toByte
    assert(Jpeg.exifMeta(badLen).isEmpty || Jpeg.exifMeta(badLen).isDefined)
  }

  test("q54 fixture closed form holds across doc ids") {
    (0L until 120L).foreach { d =>
      val m = Jpeg.exifMeta(graft.fixtures.FixtureGen.jpegExifBytes(d))
        .getOrElse(fail(s"doc $d must parse"))
      assert(m.width == 24 + d % 40 && m.height == 16 + d % 32, s"doc $d")
      assert(m.orientation == 1 + d % 8)
      assert(m.make == s"cam-${d % 5}" && m.model == s"m-${d % 7}")
      assert(m.dateTime == s"2026:0${1 + d % 9}:15 12:00:00")
      assert(m.exifWidth == 1000 + d % 100 && m.exifHeight == 2000 + d % 50)
      assert(m.iso == 100 * (1 + d % 16))
      assert(m.hasGps == (d % 3 == 0))
    }
  }
}
