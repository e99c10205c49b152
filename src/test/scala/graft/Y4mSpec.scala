package graft

import java.nio.charset.StandardCharsets

import graft.functions.{ImageOps, Y4m}
import graft.fixtures.FixtureGen
import graft.sources.DecoderRegistry

/** X1 — REAL video decode for the codec-free Y4M container: header/frame
  * parsing, BT.601 limited-range color math (exact, hand-computed), chroma
  * subsampling layouts, frame sampling, truncation/garbage classification,
  * encode round-trip, and registry dispatch through the batched operator.
  */
class Y4mSpec extends SparkSpec {

  private def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  /** One-frame stream from explicit planes. */
  private def y4m(w: Int, h: Int, cs: String, planes: Array[Int]*): Array[Byte] =
    ascii(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$cs\nFRAME\n") ++
      planes.flatten.map(_.toByte)

  private def rgbAt(img: java.awt.image.BufferedImage, x: Int, y: Int): (Int, Int, Int) = {
    val p = img.getRGB(x, y)
    ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
  }

  test("C444 exact BT.601 math on hand-computed samples") {
    // pixel 0: (Y,Cb,Cr)=(81,90,240) — BT.601 limited red:
    //   c=65 d=-38 e=112 → r=(298·65+409·112+128)>>8=255
    //   g=(298·65-100·(-38)-208·112+128)>>8=0 (clamped)
    //   b=(298·65+516·(-38)+128)>>8=0 (clamped)
    // pixel 1: (145,54,34) green; pixel 2: (41,240,110) blue;
    // pixel 3: (180,128,128) gray → (298·164+128)>>8 = 191
    val bytes = y4m(2, 2, "444",
      Array(81, 145, 41, 180), Array(90, 54, 240, 128), Array(240, 34, 110, 128))
    val p = Y4m.parse(bytes).get
    assert((p.w, p.h, p.chroma, p.frameCount) == (2, 2, "444", 1))
    val img = Y4m.frame(bytes, p, 0)
    assert(rgbAt(img, 0, 0) == ((255, 0, 0)))
    assert(rgbAt(img, 1, 0) == ((0, 255, 1)))    // c=129 d=-74 e=-94
    assert(rgbAt(img, 0, 1) == ((0, 0, 255)))    // c=25 d=112 e=-18
    assert(rgbAt(img, 1, 1) == ((191, 191, 191)))
  }

  test("4:2:0 chroma maps each 2×2 luma block to one chroma sample") {
    // 4×2: two chroma samples; left block tinted by (Cb,Cr)=(240,110),
    // right block neutral. Luma constant 100 → c=84.
    val bytes = y4m(4, 2, "420jpeg",
      Array.fill(8)(100), Array(240, 128), Array(110, 128))
    val img = Y4m.frame(bytes, Y4m.parse(bytes).get, 0)
    val neutral = (298 * 84 + 128) >> 8 // 98
    // left 2×2 block: d=112, e=-18
    val expL = (
      Math.max(0, Math.min(255, (298 * 84 + 409 * -18 + 128) >> 8)),
      Math.max(0, Math.min(255, (298 * 84 - 100 * 112 - 208 * -18 + 128) >> 8)),
      Math.max(0, Math.min(255, (298 * 84 + 516 * 112 + 128) >> 8)))
    Seq((0, 0), (1, 0), (0, 1), (1, 1)).foreach { case (x, y) =>
      assert(rgbAt(img, x, y) == expL, s"($x,$y)")
    }
    Seq((2, 0), (3, 0), (2, 1), (3, 1)).foreach { case (x, y) =>
      assert(rgbAt(img, x, y) == ((neutral, neutral, neutral)), s"($x,$y)")
    }
  }

  test("4:2:2 chroma is horizontal-only; mono decodes neutral") {
    // 2×2 C422: one chroma sample PER ROW (row 0 tinted, row 1 neutral)
    val bytes = y4m(2, 2, "422",
      Array.fill(4)(100), Array(240, 128), Array(110, 128))
    val img = Y4m.frame(bytes, Y4m.parse(bytes).get, 0)
    assert(rgbAt(img, 0, 0) == rgbAt(img, 1, 0))
    assert(rgbAt(img, 0, 1) == rgbAt(img, 1, 1))
    assert(rgbAt(img, 0, 0) != rgbAt(img, 0, 1))
    val mono = y4m(2, 1, "mono", Array(180, 16))
    val mImg = Y4m.frame(mono, Y4m.parse(mono).get, 0)
    assert(rgbAt(mImg, 0, 0) == ((191, 191, 191)))
    assert(rgbAt(mImg, 1, 0) == ((0, 0, 0)))
  }

  test("multi-frame parse: offsets, per-frame decode, fixture closed form") {
    (0L until 12L).foreach { d =>
      val bytes = FixtureGen.y4mBytes(d)
      val p = Y4m.parse(bytes).get
      assert(p.frameCount == (d % 3).toInt + 1, s"doc $d")
      (0 until p.frameCount).foreach { k =>
        val img = Y4m.frame(bytes, p, k)
        val expected = (298 * ((31 * d + 7 * k) % 220).toInt + 128) >> 8
        (0 until 4).foreach { y =>
          (0 until 8).foreach { x =>
            assert(rgbAt(img, x, y) == ((expected, expected, expected)),
              s"doc $d frame $k ($x,$y)")
          }
        }
      }
    }
  }

  test("sampleFrames: floor-spaced distinct frames, bounded by frame count") {
    // 9 frames, luma 16+10k → sampling 3 must decode frames 0, 3, 6 only
    val hdr = ascii("YUV4MPEG2 W2 H2 Cmono\n")
    val frames = (0 until 9).flatMap(k => ascii("FRAME\n") ++ Array.fill(4)((16 + 10 * k).toByte))
    val bytes = hdr ++ frames
    def gray(img: java.awt.image.BufferedImage): Int = img.getRGB(0, 0) & 0xff
    val sampled = Y4m.sampleFrames(bytes, 3).map(gray)
    val want = Seq(0, 3, 6).map(k => (298 * (10 * k) + 128) >> 8)
    assert(sampled == want)
    assert(Y4m.sampleFrames(bytes, 100).size == 9) // n > m → all m, no dups
    assert(Y4m.sampleFrames(bytes, 0).isEmpty)
  }

  test("malformed payloads classify (None/empty/null), never throw") {
    assert(Y4m.parse(null).isEmpty)
    assert(Y4m.parse(Array.emptyByteArray).isEmpty)
    assert(Y4m.parse(ascii("not a y4m stream")).isEmpty)
    assert(Y4m.parse(ascii("YUV4MPEG2 W4 H4 C420jpeg")).isEmpty) // no newline
    assert(Y4m.parse(ascii("YUV4MPEG2 W3 H2 C420jpeg\n")).isEmpty) // odd 4:2:0
    assert(Y4m.parse(ascii("YUV4MPEG2 W4 H4 C411\n")).isEmpty) // unsupported cs
    assert(Y4m.parse(ascii("YUV4MPEG2 H4 C420jpeg\n")).isEmpty) // missing W
    // header-only: parses, zero frames, decodes to null
    val hdrOnly = ascii("YUV4MPEG2 W4 H2 C420jpeg\n")
    assert(Y4m.parse(hdrOnly).get.frameCount == 0)
    assert(Y4m.decodeFirstFrame(hdrOnly) == null)
    // truncation mid-frame drops ONLY the partial frame
    val full = FixtureGen.y4mBytes(2) // 3 frames
    assert(Y4m.parse(full.dropRight(5)).get.frameCount == 2)
    assert(Y4m.sampleFrames(ascii("garbage"), 4).isEmpty)
    // hostile dims: W·H overflows Int — must classify (0 frames), not
    // drive the chunk walk to a negative index and throw
    val hostile = ascii("YUV4MPEG2 W65536 H32768 C420jpeg\nFRAME\n") ++
      Array.fill(64)(0.toByte)
    assert(Y4m.parse(hostile).get.frameCount == 0)
    assert(Y4m.decodeFirstFrame(hostile) == null)
  }

  test("encode → decode round-trip clears the 40 dB lossy gate") {
    val img = ImageOps.toImage(ImageOps.syntheticPixels(7, 32, 16), 32, 16)
    val rt = Y4m.decodeFirstFrame(Y4m.encodeFrame(img))
    val psnr = ImageOps.psnrImages(img, rt)
    assert(psnr >= 40.0, s"psnr=$psnr")
  }

  test("videoFrames operator: SOURCE frame indices; corrupt rows yield zero rows") {
    import spark.implicits._
    // 5 mono frames, luma 16+10k — sampling 2 must emit SOURCE indices
    // 0 and 2 (floor j·m/k), not sample ordinals 0 and 1, and each row's
    // pixels must come from exactly that source frame
    val five = ascii("YUV4MPEG2 W2 H2 Cmono\n") ++
      (0 until 5).flatMap(k => ascii("FRAME\n") ++ Array.fill(4)((16 + 10 * k).toByte))
    val rows = Seq(
      ("v5", five),
      ("v0", FixtureGen.y4mBytes(0)), // 1 frame
      ("bad", "nope".getBytes(StandardCharsets.US_ASCII)),
      ("nul", null: Array[Byte])).toDF("video_id", "bytes")
    val out = graft.operators.ImageBatch.videoFrames(rows, n = 2).collect()
    val byId = out.groupBy(_.getString(0))
    assert(byId("v5").map(_.getInt(1)).sorted.toSeq == Seq(0, 2))
    byId("v5").foreach { r =>
      val gray = graft.functions.ImageOps.decode(
        r.getAs[Array[Byte]]("frame")).getRGB(0, 0) & 0xff
      assert(gray == ((298 * (10 * r.getInt(1)) + 128) >> 8), s"frame ${r.getInt(1)}")
    }
    assert(byId("v0").length == 1)
    assert(!byId.contains("bad") && !byId.contains("nul")) // classified, no rows, no crash
    assert(out.forall(r => r.getAs[Array[Byte]]("frame") != null &&
      !r.isNullAt(5))) // phash from the in-hand image, per row
  }

  test("registry dispatch: y4m is real through ImageBatch; corrupt classifies") {
    assert(!DecoderRegistry.losslessFormats.contains("y4m"))
    assert(DecoderRegistry.get("y4m").decode(FixtureGen.y4mBytes(5)) != null)
    import spark.implicits._
    val rows = Seq(
      ("v0", FixtureGen.y4mBytes(0), "y4m"),
      ("v1", FixtureGen.y4mBytes(1), "y4m"),
      ("bad", "YUV4MPEG2 W8".getBytes(StandardCharsets.US_ASCII), "y4m"))
      .toDF("image_id", "bytes", "fmt")
    val out = graft.operators.ImageBatch.thumbnails(rows, 4, 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("v0").getInt(2) == 8 && out("v0").getInt(3) == 4)
    assert(out("v1").getAs[Array[Byte]]("thumb") != null)
    assert(out("bad").isNullAt(2) && out("bad").isNullAt(4)) // classified, not thrown
  }
}
