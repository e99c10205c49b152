package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Avi, ImageOps, Wav, Y4m}

/** Property sweeps for the codec-free media decoders (X1): encode→decode
  * round-trips over arbitrary content/dimensions, sampling invariants, and
  * the never-throw classification contract under random mutation — the
  * fuzz-shaped failure modes a 100 TB crawl feeds a decoder daily. */
class MediaPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(tests)
        .withInitialSeed(Seed(20260817L)), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val dims: Gen[(Int, Int)] =
    for { w <- Gen.choose(1, 48); h <- Gen.choose(1, 48) } yield (w, h)

  test("y4m: encode→decode round-trip clears 40 dB on arbitrary images") {
    check("y4m-roundtrip", Prop.forAll(dims, Gen.choose(0L, 1L << 40)) {
      case ((w, h), seed) =>
        val img = ImageOps.toImage(ImageOps.syntheticPixels(seed, w, h), w, h)
        val rt = Y4m.decodeFirstFrame(Y4m.encodeFrame(img))
        rt != null && rt.getWidth == w && rt.getHeight == h &&
          ImageOps.psnrImages(img, rt) >= 40.0
    }, tests = 120)
  }

  test("y4m: sampleFrames indices are floor-spaced, distinct, in order") {
    // m mono frames with luma == 16+k identify the frame sampled
    val gen = for { m <- Gen.choose(1, 40); n <- Gen.choose(1, 50) } yield (m, n)
    check("y4m-sampling", Prop.forAll(gen) { case (m, n) =>
      val hdr = s"YUV4MPEG2 W2 H2 Cmono\n".getBytes("US-ASCII")
      val frames = (0 until m).flatMap(k =>
        "FRAME\n".getBytes("US-ASCII") ++ Array.fill(4)((16 + k).toByte))
      val sampled = Y4m.sampleFrames(hdr ++ frames, n).map { img =>
        // invert BT.601: gray = (298·(y−16)+128)>>8 is monotone in y — just
        // recover k by matching the expected gray of each candidate luma
        val g = img.getRGB(0, 0) & 0xff
        (0 until m).find(k => ((298 * k + 128) >> 8) == g).get
      }
      val k = math.min(n, m)
      sampled == (0 until k).map(j => (j.toLong * m / k).toInt)
    })
  }

  test("y4m/wav/g711/adpcm/flac/gif/apng/avi/rle8/webp/animwebp/ico/tga/mp3/mp4/exif/ogg/mkv/heif/pdf + the whole triage: random mutation never throws — corrupt payloads classify") {
    val base: Gen[Array[Byte]] = Gen.oneOf(
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.y4mBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.wavBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.g711Bytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.adpcmBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.msAdpcmBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.qoiBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.bigEndianAudioBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.flacBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.gifBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.apngBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.aviMjpegBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.aviRleBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.aviDibBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.webpBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.animWebpBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.icoBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.tgaBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.mp3Bytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.mp4Bytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.jpegExifBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.oggBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.mkvBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.heifBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.svgBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.pdfBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.warcBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.docxBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.wdsBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.aacBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.h264Bytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.ivfBytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.ivfVp9Bytes),
      Gen.choose(0L, 99L).map(graft.fixtures.FixtureGen.ivfAv1Bytes))
    val mutation: Gen[(Array[Byte]) => Array[Byte]] = Gen.oneOf(
      Gen.choose(0, 1000).map(c => (b: Array[Byte]) => b.dropRight(c)),
      Gen.choose(0, 60).map(c => (b: Array[Byte]) => b.drop(c)),
      for { i <- Gen.choose(0, 4096); v <- Gen.choose(0, 255) } yield
        (b: Array[Byte]) =>
          if (b.isEmpty) b
          else { val c = b.clone(); c(i % c.length) = v.toByte; c })
    check("mutation-never-throws", Prop.forAll(base, Gen.listOfN(3, mutation)) {
      (bytes, ms) =>
        val mutated = ms.foldLeft(bytes)((b, m) => m(b))
        // any outcome is fine — throwing is the only failure
        Y4m.sampleFrames(mutated, 4)
        Y4m.decodeFirstFrame(mutated)
        graft.functions.ImageOps.decode(mutated) // incl. the QOI sniff
        Wav.features(mutated)
        graft.functions.Flac.features(mutated)
        graft.functions.AudioContainers.features(mutated)
        Avi.sampleFramesIndexed(mutated, 4)
        Avi.decodeFirstFrame(mutated)
        graft.functions.Gif.sampleFramesIndexed(mutated, 4)
        graft.functions.Apng.sampleFramesIndexed(mutated, 4)
        graft.functions.AnimWebp.sampleFramesIndexed(mutated, 4)
        graft.functions.Tga.decode(mutated)
        graft.functions.Mpeg.audioMeta(mutated)
        graft.functions.Mp4.videoMeta(mutated)
        graft.functions.Jpeg.exifMeta(mutated)
        graft.functions.Ogg.audioMeta(mutated)
        graft.functions.Mkv.videoMeta(mutated)
        graft.functions.Heif.imageMeta(mutated)
        graft.functions.Svg.imageMeta(mutated)
        graft.functions.Pdf.docMeta(mutated)
        graft.functions.Warc.archiveMeta(mutated)
        graft.functions.Warc.gzipMemberSizes(mutated)
        graft.functions.Warc.cdxLines("fuzz.warc", mutated)
        graft.functions.Zip.docxMeta(mutated)
        graft.operators.Webdataset.decode(mutated)
        graft.functions.Aac.audioMeta(mutated)
        graft.functions.H264.spsMeta(mutated)
        graft.functions.Ivf.videoMeta(mutated)
        graft.functions.Vp9.fromIvf(mutated)
        graft.functions.Av1.fromIvf(mutated)
        graft.functions.Av1.seqMeta(mutated)
        graft.functions.MediaMeta.describe(mutated) // the whole triage
        graft.functions.VideoContainers.sampleFramesIndexed(mutated, 4)
        true
    }, tests = 400)
  }

  test("g711: encode→features round-trip on arbitrary code bytes, both laws") {
    val gen = for {
      n <- Gen.choose(1, 400)
      tag <- Gen.oneOf(6, 7)
      codes <- Gen.listOfN(n, Gen.choose(0, 255))
    } yield (tag, codes.toArray.map(_.toByte))
    check("g711-roundtrip", Prop.forAll(gen) { case (tag, codes) =>
      val expand: Int => Int = if (tag == 7) Wav.ulaw2linear else Wav.alaw2linear
      val linear = codes.map(b => expand(b & 0xff))
      val f = Wav.features(Wav.encodeG711Mono(codes, 8000, tag)).get
      val expectRms = math.sqrt(linear.map(v => v.toDouble * v).sum / linear.length)
      f.audioFormat == tag && f.nFrames == codes.length &&
        f.peak == linear.map(math.abs).max && math.abs(f.rms - expectRms) < 1e-9 &&
        Wav.samples(Wav.encodeG711Mono(codes, 8000, tag)).get.sameElements(linear)
    })
  }

  test("adpcm: encode→samples round-trip on arbitrary blocks (packing + block walk)") {
    // the hand-stepped vector in WavSpec pins the step MATH; this pins the
    // nibble packing, block sizing, and multi-block reseed against the
    // step function threaded sample-by-sample in the test
    val gen = for {
      nBlocks <- Gen.choose(1, 4)
      nib <- Gen.choose(1, 60).map(_ * 2)
      blocks <- Gen.listOfN(nBlocks, for {
        p <- Gen.choose(-32768, 32767)
        i <- Gen.choose(0, 88)
        ns <- Gen.listOfN(nib, Gen.choose(0, 15))
      } yield Wav.AdpcmBlock(p, i, ns.toArray))
    } yield blocks
    check("adpcm-roundtrip", Prop.forAll(gen) { blocks =>
      val expected = blocks.flatMap { b =>
        var p = b.predictor; var i = b.index
        b.predictor +: b.nibbles.toSeq.map { n =>
          val (p2, i2) = Wav.adpcmStep(p, i, n); p = p2; i = i2; p2
        }
      }
      val f = Wav.features(Wav.encodeAdpcmMono(blocks, 8000)).get
      f.nFrames == expected.length &&
        Wav.samples(Wav.encodeAdpcmMono(blocks, 8000)).get.toSeq == expected
    }, tests = 120)
  }

  test("msadpcm: encode→samples round-trip on arbitrary blocks, mono and stereo") {
    // the hand-stepped vectors in WavSpec pin the LPC step math; this pins
    // the field-major header layout, high-first nibble packing, channel
    // alternation, and multi-block reseed against the step function
    // threaded nibble-by-nibble in the test
    val gen = for {
      ch <- Gen.choose(1, 2)
      nBlocks <- Gen.choose(1, 3)
      nFrames <- Gen.choose(1, 40)
      blocks <- Gen.listOfN(nBlocks, for {
        chans <- Gen.listOfN(ch, for {
          bp <- Gen.choose(0, 6)
          d <- Gen.choose(-32768, 32767)
          a <- Gen.choose(-32768, 32767)
          b <- Gen.choose(-32768, 32767)
        } yield Wav.MsChan(bp, d, a, b))
        ns <- Gen.listOfN(2 * ch * nFrames, Gen.choose(0, 15)) // even ∧ ÷ch
      } yield Wav.MsBlock(chans, ns.toArray))
    } yield blocks
    check("msadpcm-roundtrip", Prop.forAll(gen) { blocks =>
      val ch = blocks.head.chans.length
      val expected = blocks.flatMap { b =>
        val s1 = b.chans.map(_.sample1).toArray
        val s2 = b.chans.map(_.sample2).toArray
        val dl = b.chans.map(_.idelta).toArray
        val out = Seq.newBuilder[Int]
        out ++= s2.toSeq; out ++= s1.toSeq
        b.nibbles.zipWithIndex.foreach { case (n, i) =>
          val c = i % ch
          val (v, d2) = Wav.msAdpcmStep(s1(c), s2(c),
            Wav.MsCoef1(b.chans(c).bpred), Wav.MsCoef2(b.chans(c).bpred), dl(c), n)
          s2(c) = s1(c); s1(c) = v; dl(c) = d2
          out += v
        }
        out.result()
      }
      val bytes = Wav.encodeMsAdpcm(blocks, 8000)
      val f = Wav.features(bytes).get
      f.nFrames == expected.length / ch && f.channels == ch &&
        Wav.samples(bytes).get.toSeq == expected
    }, tests = 120)
  }

  test("flac: encode→decode round-trip on arbitrary subframe plans and assignments") {
    import graft.functions.Flac
    // stored-channel generator: any subframe type over a shared block size
    def subGen(b: Int): Gen[Flac.Subframe] = Gen.oneOf(
      Gen.choose(-30000, 30000).map(v => Flac.SubConstant(v.toLong, b)),
      Gen.listOfN(b, Gen.choose(-30000L, 30000L)).map(xs => Flac.SubVerbatim(xs.toArray)),
      for {
        o <- Gen.choose(0, 4)
        xs <- Gen.listOfN(b, Gen.choose(-1000L, 1000L))
        po <- Gen.oneOf(0, 1)
      } yield Flac.SubFixed(o, xs.toArray, po),
      for {
        o <- Gen.choose(1, 3)
        prec <- Gen.choose(4, 12)
        cs <- Gen.listOfN(o, Gen.choose(-(1 << (prec - 1)), (1 << (prec - 1)) - 1))
        sh <- Gen.choose(0, 10)
        xs <- Gen.listOfN(b, Gen.choose(-1000L, 1000L))
      } yield Flac.SubLpc(cs.toArray, sh, prec, xs.toArray))
    val frameGen: Gen[Flac.Frame] = for {
      b <- Gen.choose(8, 32).map(_ * 2)
      assign <- Gen.oneOf(0, 1, 8, 9, 10)
      n = if (assign <= 7) assign + 1 else 2
      subs <- Gen.listOfN(n, subGen(b))
    } yield Flac.Frame(assign, subs)
    def stored(s: Flac.Subframe): Array[Long] = s match {
      case Flac.SubConstant(v, b) => Array.fill(b)(v)
      case Flac.SubVerbatim(xs) => xs
      case Flac.SubFixed(_, xs, _) => xs
      case Flac.SubLpc(_, _, _, xs, _) => xs
    }
    // the spec's decorrelation undo, reimplemented independently
    def expected(f: Flac.Frame): Seq[Long] = {
      val ch = f.subs.map(stored)
      val out = f.assign match {
        case 8 => Seq(ch(0), ch(0).zip(ch(1)).map { case (l, s) => l - s })
        case 9 => Seq(ch(0).zip(ch(1)).map { case (s, r) => s + r }, ch(1))
        case 10 => Seq(
          ch(0).zip(ch(1)).map { case (m, s) => (((m << 1) | (s & 1)) + s) >> 1 },
          ch(0).zip(ch(1)).map { case (m, s) => (((m << 1) | (s & 1)) - s) >> 1 })
        case _ => ch.map(_.toSeq.toArray)
      }
      (0 until f.blockSize).flatMap(i => out.map(_(i)))
    }
    check("flac-roundtrip", Prop.forAll(frameGen) { f =>
      val bytes = Flac.encodeFlac(Seq(f), 44100, 16)
      Flac.samples(bytes).get.map(_.toLong).toSeq == expected(f)
    }, tests = 150)
  }

  test("wav: encode→features round-trip is exact on arbitrary PCM") {
    val gen = for {
      n <- Gen.choose(1, 500)
      rate <- Gen.oneOf(8000, 16000, 44100)
      samples <- Gen.listOfN(n, Gen.choose(-32768, 32767))
    } yield (rate, samples.toArray)
    check("wav-roundtrip", Prop.forAll(gen) { case (rate, samples) =>
      val f = Wav.features(Wav.encodePcm16Mono(samples, rate)).get
      val expectPeak = samples.map(v => math.abs(v)).max
      val expectRms = math.sqrt(samples.map(v => v.toDouble * v).sum / samples.length)
      f.nFrames == samples.length && f.sampleRate == rate &&
        f.peak == expectPeak && math.abs(f.rms - expectRms) < 1e-9 &&
        Wav.samples(Wav.encodePcm16Mono(samples, rate)).get.sameElements(samples)
    })
  }
}
