package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Heif, MediaMeta, Mp4}

/** X1 — HEIF/AVIF item-grammar metadata: pitm/iinf/iprp walk, ispe
  * dims resolved through ipma associations (1-based into ipco), irot,
  * the Exif-item PII flag, and the brand split that keeps ISO-BMFF
  * still images out of the MP4 movie walk. Malformed trees classify. */
class HeifSpec extends AnyFunSuite {

  test("round-trip recovers brand, codec, dims, rotation, items, exif flag") {
    for {
      (brand, codec) <- Seq(("avif", "av01"), ("heic", "hvc1"), ("mif1", "av01"))
      rot <- 0 until 4
      exif <- Seq(false, true)
      v1 <- Seq(false, true)
      wide <- Seq(false, true)
    } {
      val bytes = Heif.encode(brand, codec, 640, 480, rot, exif,
        v1Pitm = v1, wideIpma = wide)
      val m = Heif.imageMeta(bytes)
        .getOrElse(fail(s"$brand v1=$v1 wide=$wide must parse"))
      assert(m.brand == brand && m.codec == codec)
      assert(m.width == 640 && m.height == 480)
      assert(m.rotationDeg == rot * 90)
      assert(m.nItems == (if (exif) 2 else 1) && m.hasExif == exif)
    }
  }

  test("ispe/irot resolve through ipma associations, not ipco position") {
    // the encoder plants a free decoy at ipco index 2: a walk that read
    // properties positionally (index = ordinal) would land on the decoy
    // for the second association instead of irot at index 3
    val m = Heif.imageMeta(Heif.encode("avif", "av01", 33, 44, 3, withExif = false)).get
    assert(m.width == 33 && m.height == 44 && m.rotationDeg == 270)
  }

  test("brand split: HEIF brands are images, movie brands are not HEIF") {
    assert(Heif.isHeif(Heif.encode("avif", "av01", 8, 8, 0, withExif = false)))
    assert(Heif.isHeif(Heif.encode("heic", "hvc1", 8, 8, 0, withExif = false)))
    val movie = Mp4.encode("isom", 1000,
      video = Some(Mp4.VideoSpec("avc1", 64, 48, 25, 512, 12800)), audio = None)
    assert(!Heif.isHeif(movie))
    assert(Heif.imageMeta(movie).isEmpty)
    // and the triage routes each to its side
    val img = MediaMeta.describe(Heif.encode("heic", "hvc1", 12, 34, 1, withExif = true))
    assert(img.kind == "image" && img.container == "heic" && img.codec == "hvc1")
    assert(img.width == 12 && img.height == 34)
    val vid = MediaMeta.describe(movie)
    assert(vid.kind == "video" && vid.container == "mp4")
  }

  test("junk, truncation, and structural damage classify — never throw") {
    assert(Heif.imageMeta(null).isEmpty)
    assert(Heif.imageMeta(Array.fill(64)(0x31.toByte)).isEmpty)
    val bytes = Heif.encode("avif", "av01", 100, 80, 2, withExif = true)
    var cut = 1
    while (cut < bytes.length) {
      Heif.imageMeta(bytes.take(cut)) // any outcome but a throw
      cut += 3
    }
    // meta stripped → no pitm/infe → classify
    val ftypOnly = bytes.take(
      bytes.indexOfSlice("meta".getBytes(java.nio.charset.StandardCharsets.US_ASCII)) - 4)
    assert(Heif.imageMeta(ftypOnly).isEmpty)
    // zero-dim ispe → classify
    val zeroDim = Heif.encode("avif", "av01", 1, 1, 0, withExif = false)
    val i = zeroDim.indexOfSlice("ispe".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val broken = zeroDim.clone()
    java.util.Arrays.fill(broken, i + 8, i + 16, 0.toByte)
    assert(Heif.imageMeta(broken).isEmpty)
  }

  test("fixture: closed form holds for the q58 oracle") {
    for (d <- 0L until 120L) {
      val m = Heif.imageMeta(graft.fixtures.FixtureGen.heifBytes(d)).get
      assert(m.brand == (if (d % 2 == 0) "avif" else "heic"))
      assert(m.codec == (if (d % 2 == 0) "av01" else "hvc1"))
      assert(m.width == 64 + 4 * (d % 50) && m.height == 48 + 2 * (d % 60))
      assert(m.rotationDeg == 90 * (d % 4))
      assert(m.nItems == (if (d % 3 == 0) 2 else 1) && m.hasExif == (d % 3 == 0))
    }
  }
}
