package graft

import java.awt.image.BufferedImage

import graft.functions.{Avi, Rle8, VideoContainers}
import graft.fixtures.FixtureGen

/** X1 — REAL inter-frame video decode: Microsoft RLE8 in RIFF/AVI.
  * Unlike MJPEG (standalone frames), RLE8 frames are DELTA chunks onto a
  * shared canvas — these specs pin the compositing semantics (skipped
  * pixels retain the previous frame), every opcode family (run, absolute,
  * end-of-line, delta move, end-of-bitmap, word padding), and the
  * never-throw classification contract on hostile opcode streams. */
class Rle8Spec extends SparkSpec {

  private def gray(img: BufferedImage, x: Int, y: Int): Int = img.getRGB(x, y) & 0xff

  private def uniformGray(img: BufferedImage, x0: Int, y0: Int, x1: Int, y1: Int): Int = {
    val g0 = gray(img, x0, y0)
    (y0 until y1).foreach(y => (x0 until x1).foreach { x =>
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xff) == g0 && ((p >> 8) & 0xff) == g0 && (p & 0xff) == g0,
        s"($x,$y): not uniform gray $g0")
    })
    g0
  }

  test("keyframe + delta patches: skipped pixels retain the PREVIOUS frame") {
    // frame 0 fills with 50; frame 1 paints an 8x8 patch of 200 at (4,4)
    // via runs; frame 2 repaints it 90 via absolute mode — the background
    // of frames 1 and 2 is only 50 if compositing carried it forward
    val ops = Seq(
      Rle8.opFull(16, 16, 50),
      Rle8.opPatch(16, 16, 4, 4, 8, 8, 200, absolute = false),
      Rle8.opPatch(16, 16, 4, 4, 8, 8, 90, absolute = true))
    val bytes = Avi.encodeRle8(16, 16, Rle8.grayPalette, ops)
    val p = Avi.parse(bytes).get
    assert(p.isRle8 && p.w == 16 && p.h == 16 && p.frameCount == 3)
    val frames = Avi.sampleFramesIndexed(bytes, Int.MaxValue)
    assert(frames.map(_._1) == Seq(0, 1, 2))
    assert(uniformGray(frames(0)._2, 0, 0, 16, 16) == 50)
    Seq((1, 200), (2, 90)).foreach { case (k, pg) =>
      val img = frames(k)._2
      assert(uniformGray(img, 4, 4, 12, 12) == pg, s"frame $k patch")
      // the four background strips around the patch retained frame 0
      assert(uniformGray(img, 0, 0, 16, 4) == 50, s"frame $k above")
      assert(uniformGray(img, 0, 12, 16, 16) == 50, s"frame $k below")
      assert(uniformGray(img, 0, 4, 4, 12) == 50, s"frame $k left")
      assert(uniformGray(img, 12, 4, 16, 12) == 50, s"frame $k right")
    }
  }

  test("a delta frame decoded STANDALONE differs — the codec is genuinely inter-frame") {
    val patchOnly = Rle8.opPatch(16, 16, 4, 4, 8, 8, 200, absolute = false)
    // decode the delta chunk onto a blank canvas: the patch lands but the
    // background stays black — NOT the composited result
    val blank = Array.fill(16 * 16)(0xff000000)
    Rle8.applyChunk(patchOnly, 0, patchOnly.length, blank, 16, 16, Rle8.grayPalette)
    assert((blank(8 * 16 + 8) & 0xff) == 200) // patch painted
    assert((blank(0) & 0xff) == 0) // background NOT the keyframe's 50
    // whereas the container walk composites: frame 1's background is 50
    val bytes = Avi.encodeRle8(16, 16, Rle8.grayPalette,
      Seq(Rle8.opFull(16, 16, 50), patchOnly))
    val f1 = Avi.sampleFramesIndexed(bytes, Int.MaxValue)(1)._2
    assert(gray(f1, 0, 0) == 50 && gray(f1, 8, 8) == 200)
  }

  test("delta moves skip both axes; end-of-line resets x; bottom-up rows") {
    // hand-assembled: delta right 3 / up 2 stored rows, paint 4 px of 77;
    // EOL then paint 2 px of 99 at x=0 of the NEXT stored row
    val ops = Array[Byte](0, 2, 3, 2, 4, 77, 0, 0, 2, 99, 0, 1)
    val canvas = Array.fill(8 * 8)(0xff000000)
    Rle8.applyChunk(ops, 0, ops.length, canvas, 8, 8, Rle8.grayPalette)
    // stored row 2 = canvas row 5 (bottom-up), x 3..6 → 77
    (3 until 7).foreach(x => assert((canvas(5 * 8 + x) & 0xff) == 77, s"x=$x"))
    assert((canvas(5 * 8 + 2) & 0xff) == 0 && (canvas(5 * 8 + 7) & 0xff) == 0)
    // stored row 3 = canvas row 4, x 0..1 → 99
    assert((canvas(4 * 8) & 0xff) == 99 && (canvas(4 * 8 + 1) & 0xff) == 99)
    assert((canvas(4 * 8 + 2) & 0xff) == 0)
  }

  test("absolute mode pads odd counts to a word boundary") {
    // absolute 3 px (odd → 1 pad byte), then a 2-px run right after: the
    // run lands at x=3 only if the pad byte was consumed
    val ops = Array[Byte](0, 3, 10, 20, 30, 0, 2, 40, 0, 1)
    val canvas = Array.fill(8 * 8)(0xff000000)
    Rle8.applyChunk(ops, 0, ops.length, canvas, 8, 8, Rle8.grayPalette)
    val bottom = 7 * 8
    assert(Seq(10, 20, 30, 40, 40) ==
      (0 until 5).map(x => canvas(bottom + x) & 0xff))
  }

  test("fixture closed form: frame count, exact two-region grays, dispatch") {
    (0L until 9L).foreach { d =>
      val bytes = FixtureGen.aviRleBytes(d)
      val frames = VideoContainers.sampleFramesIndexed(bytes, Int.MaxValue)
      assert(frames.size == (d % 3).toInt + 1, s"doc $d")
      val bg = (20 + (43 * d) % 225).toInt
      frames.foreach { case (k, img) =>
        assert(img.getWidth == 16 && img.getHeight == 16)
        val pg = if (k == 0) bg else (20 + (43 * d + 19 * k) % 225).toInt
        (0 until 16).foreach(y => (0 until 16).foreach { x =>
          val e = if (k >= 1 && x >= 4 && x < 12 && y >= 4 && y < 12) pg else bg
          assert(gray(img, x, y) == e, s"doc $d frame $k ($x,$y)")
        })
      }
    }
  }

  test("sampling decimation: floor-spaced source indices over one sequential walk") {
    // 10 frames: keyframe 30 then patches 40,50,… — sampled frame k's
    // patch gray identifies it; background stays the keyframe's 30
    val ops = Rle8.opFull(16, 16, 30) +: (1 until 10).map(k =>
      Rle8.opPatch(16, 16, 4, 4, 8, 8, 30 + 10 * k, absolute = k % 2 == 0))
    val bytes = Avi.encodeRle8(16, 16, Rle8.grayPalette, ops)
    Seq(1, 3, 7, 10, 99).foreach { n =>
      val sampled = Avi.sampleFramesIndexed(bytes, n)
      val k = math.min(n, 10)
      assert(sampled.map(_._1) == (0 until k).map(j => (j.toLong * 10 / k).toInt), s"n=$n")
      sampled.foreach { case (idx, img) =>
        assert(gray(img, 8, 8) == 30 + 10 * idx, s"n=$n idx=$idx patch")
        assert(gray(img, 0, 0) == 30, s"n=$n idx=$idx background")
      }
    }
  }

  test("hostile opcode streams classify — clamped writes, never a throw") {
    val pal = Rle8.grayPalette
    def run(ops: Array[Byte]): Array[Int] = {
      val canvas = Array.fill(8 * 8)(0xff000000)
      Rle8.applyChunk(ops, 0, ops.length, canvas, 8, 8, pal)
      canvas
    }
    run(Array[Byte](255.toByte, 7)) // run far past the row: clamped to w
    run(Array[Byte](0, 2, 255.toByte, 255.toByte, 9, 7)) // delta off-canvas
    run(Array[Byte](0, 200.toByte, 1, 2)) // absolute count past the data
    run(Array[Byte](0, 2, 3)) // truncated delta
    run(Array[Byte](5)) // half an opcode
    run(Array.emptyByteArray)
    // many EOLs walk r past the top; later writes must drop, not wrap
    val eols = Array.fill(40)(Array[Byte](0, 0)).flatten ++ Array[Byte](4, 7, 0, 1)
    val c = run(eols)
    assert(c.forall(p => (p & 0xff) == 0), "off-top writes must drop")
    // container-level: truncation anywhere classifies
    val good = FixtureGen.aviRleBytes(2L)
    (1 until 8).foreach { i =>
      Avi.sampleFramesIndexed(java.util.Arrays.copyOfRange(good, 0, good.length * i / 8), 4)
    }
    // a claimed giant avih geometry must not allocate a bomb canvas
    val p = Avi.parse(good).get
    assert(p.isRle8)
    val hostile = good.clone()
    // avih dwWidth/dwHeight sit at avih body + 32/36; avih body starts at
    // RIFF(12) + LIST hdr(8) + "hdrl"(4) + chunk hdr(8) = 32
    val avihBody = 32
    (0 until 3).foreach { j => // 0x00ffffff × 0x00ffffff pixels claimed
      hostile(avihBody + 32 + j) = 0xff.toByte; hostile(avihBody + 36 + j) = 0xff.toByte
    }
    assert(Avi.sampleFramesIndexed(hostile, 4).isEmpty) // classify, no OOM
  }

  test("registry + thumbnail path: decodeFirstFrame serves the keyframe") {
    val bytes = FixtureGen.aviRleBytes(4L)
    val img = Avi.decodeFirstFrame(bytes)
    val bg = (20 + (43 * 4) % 225).toInt
    assert(gray(img, 0, 0) == bg && gray(img, 8, 8) == bg)
    // the "avi" registry decoder now serves BOTH codecs by content
    val dec = graft.sources.DecoderRegistry.get("avi")
    assert((dec.decode(bytes).getRGB(3, 3) & 0xff) == bg)
  }
}
