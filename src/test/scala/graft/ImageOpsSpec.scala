package graft

import org.apache.spark.sql.functions._

import graft.functions.ImageOps
import graft.fixtures.FixtureGen

/** C11/J7 — image decode/PSNR/phash invariants (input_hint gates). */
class ImageOpsSpec extends SparkSpec {
  import spark.implicits._

  test("png round-trip is lossless (PSNR capped 999)") {
    (0L to 20L by 2).foreach { i => // even ids are png
      val r = FixtureGen.imageRow(i)
      assert(r.fmt == "png")
      assert(ImageOps.psnrVsSynthetic(r.bytes, i, r.w, r.h) == 999.0, s"id $i")
    }
  }

  test("jpg round-trip clears the 40dB gate") {
    (1L to 21L by 2).foreach { i => // odd ids are jpg
      val r = FixtureGen.imageRow(i)
      assert(r.fmt == "jpg")
      val psnr = ImageOps.psnrVsSynthetic(r.bytes, i, r.w, r.h)
      assert(psnr >= 40.0, s"id $i psnr=$psnr")
      assert(psnr < 999.0, s"id $i should be lossy")
    }
  }

  test("phash: stable, near-dup tolerant, separates distinct images") {
    val a = FixtureGen.imageRow(4)
    assert(ImageOps.phash64(a.bytes) == a.phash) // recompute == stored
    // same pixels through lossy jpg → tiny hamming distance
    val img = ImageOps.toImage(ImageOps.syntheticPixels(4, a.w, a.h), a.w, a.h)
    val jpg = ImageOps.encode(img, "jpg")
    assert(ImageOps.hamming64(ImageOps.phash64(jpg), a.phash) <= 4)
    // distinct images: mostly distinct hashes over a window
    val hashes = (0L until 32L).map(i => FixtureGen.imageRow(i).phash).toSet
    assert(hashes.size >= 24)
  }

  test("resizeBox deterministic and shape-correct") {
    val r = FixtureGen.imageRow(6)
    val out1 = ImageOps.resizeBox(r.bytes, 16, 16, "png")
    val out2 = ImageOps.resizeBox(r.bytes, 16, 16, "png")
    assert(java.util.Arrays.equals(out1, out2))
    val d = ImageOps.decode(out1)
    assert(d.getWidth == 16 && d.getHeight == 16)
  }

  test("video frame-sample stub plumbing") {
    val r = FixtureGen.imageRow(8)
    val frames = ImageOps.sampleFramesStub(r.bytes, 3)
    assert(frames.size == 3)
    frames.foreach(f => assert(ImageOps.decode(f) != null))
  }

  test("corrupt payloads decode to null, never throw (one bad row must not kill a stage)") {
    val r = FixtureGen.imageRow(8)
    // recognized-but-truncated: valid magic bytes, cut body — ImageIO.read
    // THROWS IIOException for most readers here (it does not return null
    // on its own); a few readers instead return a partial image, so the
    // contract under test is NO THROW, with null-or-image both acceptable
    val truncated = r.bytes.take(r.bytes.length / 2)
    ImageOps.decode(truncated) // must not throw
    // unrecognized garbage: ImageIO's no-reader null path
    assert(ImageOps.decode("not an image".getBytes) == null)
    assert(ImageOps.decode(Array.emptyByteArray) == null)
    // the video stub honors the registry's null-decode contract for
    // undecodable bytes instead of .head-crashing on zero frames
    val video = graft.sources.DecoderRegistry.get("video")
    assert(video.decode("junk".getBytes) == null)
    assert(video.decode(truncated) == null)
  }

  test("distributed images table: every row passes the J7 invariant") {
    val images = FixtureGen.imagesDF(spark, 64L)
    val checked = images
      .withColumn("psnr", ImageOps.psnrVsSyntheticUdf(
        $"bytes", regexp_extract($"image_id", "(\\d+)", 1).cast("long"), $"w", $"h"))
      .withColumn("phash2", ImageOps.phashUdf($"bytes"))
    val bad = checked.where(
      ($"fmt" === "png" && $"psnr" =!= 999.0) ||
      ($"fmt" === "jpg" && $"psnr" < 40.0) ||
      ($"phash2" =!= $"phash")).count()
    assert(bad == 0)
    assert(images.count() == 64)
    // caption regeneration parity (the J7 caption-equality leg)
    val capUdf = udf((i: Long) => FixtureGen.caption(i))
    val capBad = checked
      .withColumn("cap2", capUdf(regexp_extract($"image_id", "(\\d+)", 1).cast("long")))
      .where($"cap2" =!= $"caption").count()
    assert(capBad == 0)
  }
}
