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

  test("q08/q09 are invariant under session timezone AND NTZ-inference conf (driver-zone failure mode)") {
    // Rounds 1-3: q09 was the one red driver row. Rounds 1-2 were an
    // NTZ→LTZ cast (fixed by wall-clock-field micros); round 3's residual
    // was the READ side: events.ts is written isAdjustedToUTC=false, so with
    // spark.sql.parquet.inferTimestampNTZ.enabled=false the driver session
    // reads it as TIMESTAMP_LTZ (raw micros = UTC instant) while field
    // extraction applies the session zone — shifting start_us by the full
    // zone offset. SparkEntry.events pins `ts TIMESTAMP_NTZ` in the read
    // schema, which overrides the conf. This spec runs the SAME queries
    // under {UTC, America/New_York (DST), Australia/Lord_Howe (half-hour)}
    // × {inference on, inference off}; all six must be bit-identical.
    val dir = "/root/testdata/sf0.001"
    val inferKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    def run(q: String, tz: String, inferNtz: Boolean): Seq[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.sql.session.timeZone", tz)
      spark.conf.set(inferKey, inferNtz.toString)
      try SparkEntry.queries(q)(spark, dir).collect().toSeq
      finally {
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set(inferKey, "true")
      }
    }
    for (q <- Seq("q08_events_hourly", "q09_sessionize")) {
      val baseline = run(q, "UTC", inferNtz = true)
      assert(baseline.nonEmpty, s"$q: empty baseline")
      for {
        tz <- Seq("UTC", "America/New_York", "Australia/Lord_Howe", "Asia/Tokyo")
        infer <- Seq(true, false)
        if !(tz == "UTC" && infer)
      } assert(run(q, tz, infer) == baseline, s"$q diverged under tz=$tz inferNTZ=$infer")
      // ANSI is the other session knob a harness could flip (Spark 4
      // defaults it ON; a permissive harness might run it off) — results
      // must not move either way
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try assert(run(q, "UTC", inferNtz = true) == baseline, s"$q diverged under ansi=false")
      finally spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("fixture contract: documents text properties the q32/q33 generated oracles assume") {
    // q32's 3-chunk reconstruction and q33's doc_id%6 → level table are
    // valid ONLY under these text properties; if the driver regenerates
    // fixtures differently, fail HERE with a pointer instead of a silent
    // oracle/query divergence.
    val noise = Seq("cookie", "privacy policy", "terms of service",
      "subscribe", "toggle dark", "toggle light", "dark mode", "light mode",
      "skip to content", "table of contents", "on this page",
      "all rights reserved", "powered by")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val texts = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select("text").as[String].collect()
      assert(texts.nonEmpty)
      texts.foreach { t =>
        assert(t.length >= 40 && t.length < 2000,
          s"$sf: doc length ${t.length} outside the oracle-assumed range")
        assert(!t.exists("\n#{`|$".contains(_)),
          s"$sf: doc contains a chunk/classify-significant char")
        val lower = t.toLowerCase(java.util.Locale.ROOT)
        assert(!noise.exists(lower.contains),
          s"$sf: doc contains a cleanup noise indicator")
      }
    }
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

    // corrupt/null payloads CLASSIFY (null dims/thumb), never crash the
    // stage: at 100 TB a bad image is routine input
    import org.apache.spark.sql.Row
    val badRows = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("bad-corrupt", "nope".getBytes("UTF-8"), "png"),
        Row("bad-null", null, "jpg")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("image_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("bytes",
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("fmt",
          org.apache.spark.sql.types.StringType))))
    val mixed = ImageBatch.thumbnails(
      images.select("image_id", "bytes", "fmt").unionByName(badRows), 16, 16)
      .collect()
    assert(mixed.length == 26)
    val bad = mixed.filter(_.getString(0).startsWith("bad-"))
    assert(bad.length == 2 && bad.forall(r => r.isNullAt(2) && r.isNullAt(4)))
    assert(mixed.count(r => !r.isNullAt(4)) == 24) // good rows unaffected
  }

  test("batched media triage: content-routed typed rows, shuffle-free plan") {
    import org.apache.spark.sql.functions.{col, udf}
    // one payload per container family, keyed by content — no fmt column
    val gens: Map[String, Long => Array[Byte]] = Map(
      "jpeg" -> FixtureGen.jpegExifBytes, "mp4" -> FixtureGen.mp4Bytes,
      "ogg" -> FixtureGen.oggBytes, "wav" -> FixtureGen.wavBytes,
      "y4m" -> FixtureGen.y4mBytes, "gif" -> FixtureGen.gifBytes,
      "webp" -> FixtureGen.webpBytes, "heif" -> FixtureGen.heifBytes,
      "svg" -> FixtureGen.svgBytes, "tga" -> FixtureGen.tgaBytes)
    val mk = udf((name: String, i: Long) => gens(name)(i))
    val media = spark.createDataset(gens.keys.toSeq.sorted.flatMap(n =>
      (0L until 6L).map(i => (s"$n-$i", n, i))))
      .toDF("media_id", "family", "i")
      .select(col("media_id"), mk(col("family"), col("i")).as("bytes"))
    val out = graft.operators.ImageBatch.triage(media)
    assert(out.schema == ImageBatch.triageSchema)
    // a triage is a NARROW map — any Exchange here is a plan regression
    val planned = out.queryExecution.executedPlan.toString
    assert(!planned.contains("Exchange"), planned)
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId.size == 60)
    def kindOf(prefix: String): Set[String] =
      byId.collect { case (id, r) if id.startsWith(prefix + "-") => r.getString(1) }.toSet
    assert(kindOf("jpeg") == Set("image") && kindOf("svg") == Set("image"))
    assert(kindOf("heif") == Set("image") && kindOf("webp") == Set("image"))
    assert(kindOf("mp4") == Set("video") && kindOf("y4m") == Set("video"))
    assert(kindOf("ogg") == Set("audio") && kindOf("wav") == Set("audio"))
    assert(kindOf("gif") == Set("image", "video")) // frame count splits it
    assert(kindOf("tga") == Set("unknown")) // signature-less: content-honest
    // spot fields: the wav row carries audio facts, the heif row image dims
    val wav0 = byId("wav-0")
    assert(wav0.getString(2) == "wav" && wav0.getInt(7) == 8000 && wav0.getInt(8) == 1)
    val heif0 = byId("heif-0")
    assert(heif0.getInt(4) == 64 && heif0.getInt(5) == 48 && heif0.getLong(6) == -1L)
    // corrupt + null bytes classify as unknown rows, never a stage abort
    val junk = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("junk", Array.fill[Byte](64)(7)),
        org.apache.spark.sql.Row("nul", null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("bytes",
          org.apache.spark.sql.types.BinaryType))))
    val j = graft.operators.ImageBatch.triage(junk).collect()
    assert(j.length == 2 && j.forall(_.getString(1) == "unknown"))
  }

  test("source hygiene: no raw control bytes in src/ (text tools must never skip a file as binary)") {
    // A literal NUL once hid CrawlEngine.scala from every grep-based
    // leak/copy scan. Tab/CR/LF are fine; anything else below 0x20 is not.
    val allowed = Set(0x09, 0x0a, 0x0d)
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get("src"))
    try walk.filter(p => p.toString.endsWith(".scala") || p.toString.endsWith(".py"))
      .forEach { p =>
        val bytes = java.nio.file.Files.readAllBytes(p)
        val bad = bytes.indexWhere(b => (b & 0xff) < 0x20 && !allowed((b & 0xff)))
        if (bad >= 0)
          offenders += s"$p: byte 0x${(bytes(bad) & 0xff).toHexString} at offset $bad"
      }
    finally walk.close()
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
