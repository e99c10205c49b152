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

  test("q09_sessionize is invariant under session timezone (driver-zone failure mode)") {
    // Rounds 1-2: q09 was the one red driver row — an NTZ→LTZ cast shifted
    // start_us by the harness's zone offset. The rewrite derives micros from
    // wall-clock fields only; running the SAME query under three zones
    // (one with DST) must produce bit-identical results.
    val dir = "/root/testdata/sf0.001"
    def run(tz: String): Seq[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.sql.session.timeZone", tz)
      try SparkEntry.queries("q09_sessionize")(spark, dir).collect().toSeq
      finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    val utc = run("UTC")
    assert(utc.nonEmpty)
    assert(run("America/New_York") == utc)
    assert(run("Asia/Tokyo") == utc)
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
