package graft

import graft.operators.ImageBatch
import graft.fixtures.FixtureGen

/** Driver t1 smoke parity + batched multimodal plumbing. */
class EntrySpec extends SparkSpec {
  import spark.implicits._

  test("entry() yields fetched image+caption rows (driver smoke gate)") {
    val df = SparkEntry.entry(spark)
    val n = df.count()
    assert(n > 0, "entry must produce rows")
    assert(df.columns.toSet == Set("image_id", "url", "fmt", "caption", "phash", "epoch"))
  }

  test("batched multimodal transform: thumbnails with typed schema") {
    val images = FixtureGen.imagesDF(spark, 24L)
    val thumbs = ImageBatch.thumbnails(images, 16, 16, batchSize = 8)
    assert(thumbs.schema == ImageBatch.outputSchema)
    val rows = thumbs.collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      val t = graft.functions.ImageOps.decode(r.getAs[Array[Byte]]("thumb"))
      assert(t.getWidth == 16 && t.getHeight == 16)
    }
    // deterministic: same input → same phash column
    val a = thumbs.select("thumb_phash").as[Long].collect().toSeq
    val b = ImageBatch.thumbnails(images, 16, 16).select("thumb_phash").as[Long].collect().toSeq
    assert(a == b)
  }
}
