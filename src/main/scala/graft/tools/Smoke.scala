package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.urlfns

/** Dev smoke driver: exercises the library surface against the driver
  * testdata through a real SparkSession (codegen path, SQL registration).
  * Not part of the engine; used by /verify flows.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    urlfns.register(spark)

    // Synthesize a URL column from real testdata and canonicalize it via
    // both the Column API and SQL.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val urls = docs.select(
      concat(lit("HTTPS://Site-"), ($"doc_id" % 5).cast("string"),
        lit(".TEST/Docs/"), $"doc_id".cast("string"),
        when($"doc_id" % 3 === 0, lit("/")).otherwise(lit("")),
        when($"doc_id" % 2 === 0, lit("#frag")).otherwise(lit(""))).as("url"))
    val canon = urls.select($"url", urlfns.url_canonicalize($"url").as("canon"),
      urlfns.url_host(urlfns.url_canonicalize($"url")).as("host"))
    canon.show(6, truncate = false)
    canon.explain("formatted")

    urls.createOrReplaceTempView("urls")
    val viaSql = spark.sql(
      "SELECT url, url_canonicalize(url) AS canon, url_path(url) AS path FROM urls LIMIT 5")
    viaSql.show(5, truncate = false)

    // url_resolve through codegen
    val resolved = urls.limit(3).select(
      urlfns.url_resolve(lit("https://site-0.test/a/b/"), lit("../x")).as("r1"),
      urlfns.url_resolve($"url", lit("child/page")).as("r2"))
    resolved.show(3, truncate = false)

    // probes: null input, malformed URLs, non-http schemes
    val probes = Seq(
      (null: String), "", "::::", "mailto:a@b.c", "https://UPPER.com/Path/",
      "a".repeat(3000), "http://h/p;params?q#f").toDF("u")
      .select($"u", urlfns.url_canonicalize($"u").as("c"))
    probes.show(10, truncate = false)

    // F2/F3/F5/F7 drive: filter a synthesized corpus, robots-admit, detect blocks
    val corpus = docs.select(
      concat(lit("https://site-0.test/docs/"),
        when($"doc_id" % 7 === 0, lit("blog/")).otherwise(lit("")),
        when($"doc_id" % 11 === 0, lit("es/")).otherwise(lit("")),
        $"doc_id".cast("string"),
        when($"doc_id" % 13 === 0, lit(".pdf")).otherwise(lit(""))).as("url"))
    val filtered = graft.operators.UrlFilters.filterUrls(
      corpus, $"url", "https://site-0.test/docs", "en")
    println(s"SMOKE filter: ${corpus.count()} -> ${filtered.count()}")
    filtered.show(4, truncate = false)

    val policies = Map("site-0.test" ->
      graft.operators.Robots.parse("User-agent: *\nDisallow: /docs/4\nAllow: /docs/42\nCrawl-delay: 1"))
    val bc = graft.operators.Robots.broadcastPolicies(spark, policies)
    val admitted = filtered
      .withColumn("host", urlfns.url_host($"urlNorm"))
      .withColumn("path", urlfns.url_path($"urlNorm"))
      .where(graft.operators.Robots.allowedUdf(bc)($"host", $"path"))
    println(s"SMOKE robots: ${filtered.count()} -> ${admitted.count()}")

    val blocked = docs.select($"doc_id",
      graft.operators.UrlFilters.isBlockedResponse(
        concat($"text", when($"doc_id" % 50 === 0,
          lit(" checking your browser ... cloudflare ray id")).otherwise(lit("")))).as("b"))
      .where($"b").count()
    println(s"SMOKE blocked detected: $blocked")

    // round-4 q08/q09 fix drive: the pinned-NTZ events read must survive the
    // adversarial driver config (LTZ inference + non-whole-hour zone) with
    // byte-identical q08/q09 output.
    locally {
      val inferKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
      def dump(q: String): Seq[org.apache.spark.sql.Row] =
        graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").collect().toSeq
      val base08 = dump("q08_events_hourly")
      val base09 = dump("q09_sessionize")
      assert(base08.head.schema("hour").dataType.typeName == "timestamp_ntz",
        s"q08 hour must stay NTZ, got ${base08.head.schema("hour").dataType}")
      spark.conf.set(inferKey, "false")
      spark.conf.set("spark.sql.session.timeZone", "Australia/Lord_Howe")
      val adv08 = dump("q08_events_hourly")
      val adv09 = dump("q09_sessionize")
      spark.conf.set(inferKey, "true")
      spark.conf.unset("spark.sql.session.timeZone")
      assert(adv08 == base08 && adv09 == base09, "q08/q09 shifted under adversarial session conf")
      println(s"SMOKE ntz-pin: q08=${base08.size} q09=${base09.size} rows invariant under LTZ-inference+Lord_Howe")
    }

    // round-4 Y4M drive: the REAL video decode through the distributed
    // batch operator AND the q35 query against its closed-form expectation
    locally {
      val vids = spark.range(24).select(
        concat(lit("v"), $"id").as("image_id"),
        udf((d: Long) => graft.fixtures.FixtureGen.y4mBytes(d)).apply($"id").as("bytes"),
        lit("y4m").as("fmt"))
      val thumbs = graft.operators.ImageBatch.thumbnails(vids, 4, 4)
        .where($"w" === 8 && $"h" === 4 && $"thumb".isNotNull).count()
      val q35 = graft.SparkEntry.queries("q35_video_frames")(spark, "/root/testdata/sf0.001")
      val bad = q35.where($"gray" =!=
        expr("(298*((31*doc_id + 7*frame_idx) % 220) + 128) div 256"))
      assert(thumbs == 24, s"y4m thumbs=$thumbs")
      assert(bad.isEmpty, "q35 decoded gray diverges from closed form")
      val q36 = graft.SparkEntry.queries("q36_audio_features")(spark, "/root/testdata/sf0.001")
      val badWav = q36.where($"peak" =!= $"rms" ||
        $"peak" =!= lit(1000) + ($"doc_id" % 100) * 31)
      assert(badWav.isEmpty, "q36 wav features diverge from closed form")
      println(s"SMOKE y4m+wav: thumbs=$thumbs q35_rows=${q35.count()} " +
        s"q36_rows=${q36.count()} all match closed form")
    }

    // round-5 compressed-codec drive: MJPEG/AVI through the distributed
    // frame sampler (magic-sniffed container dispatch) and the G.711 query
    // against the ITU closed form
    locally {
      val vids = spark.range(24).select(
        concat(lit("a"), $"id").as("video_id"),
        udf((d: Long) => graft.fixtures.FixtureGen.aviMjpegBytes(d)).apply($"id").as("bytes"))
      val frames = graft.operators.ImageBatch.videoFrames(vids, 4)
        .where($"w" === 16 && $"h" === 16 && $"frame".isNotNull)
      val nFrames = frames.count()
      val expect = (0L until 24L).map(d => d % 3 + 1).sum // (d%3)+1 frames each
      assert(nFrames == expect, s"avi frames=$nFrames expected=$expect")
      val q38 = graft.SparkEntry.queries("q38_video_mjpeg")(spark, "/root/testdata/sf0.001")
      assert(q38.where(!$"ok" || $"w" =!= 16 || $"h" =!= 16).isEmpty,
        "q38 mjpeg decode gate failed")
      val q37 = graft.SparkEntry.queries("q37_audio_g711")(spark, "/root/testdata/sf0.001")
      val expand = udf((d: Long) => {
        val b0 = ((d * 37) % 256).toInt
        math.abs(if (d % 2 == 0) graft.functions.Wav.ulaw2linear(b0)
                 else graft.functions.Wav.alaw2linear(b0)).toLong
      })
      val badG711 = q37.where($"peak" =!= $"rms" || $"peak" =!= expand($"doc_id") ||
        $"codec" =!= when($"doc_id" % 2 === 0, 7L).otherwise(6L))
      assert(badG711.isEmpty, "q37 g711 features diverge from ITU closed form")
      println(s"SMOKE avi+g711: frames=$nFrames q38_rows=${q38.count()} " +
        s"q37_rows=${q37.count()} all match closed form")
      // IMA ADPCM (q39): the stateful 4-bit codec through the distributed
      // query; gate the exact-integer features against the fixture's closed
      // form (pattern 0 ramp peak = |P| or ramp max, pattern 2 peak = |P|)
      val q39 = graft.SparkEntry.queries("q39_audio_adpcm")(spark, "/root/testdata/sf0.001")
      val badAdpcm = q39.where(
        $"n_frames" =!= (lit(61) + ($"doc_id" % 20) * 2) * 2 ||
          ($"doc_id" % 3 === 1 && $"peak" =!= 32767) ||
          ($"doc_id" % 3 === 2 && $"peak" =!= abs(($"doc_id" * 131) % 20000 - 10000)))
      assert(badAdpcm.isEmpty, "q39 adpcm features diverge from closed form")
      println(s"SMOKE adpcm: q39_rows=${q39.count()} matches closed form")
      // FLAC (q40): the entropy-coded codec through the distributed query;
      // gate against the fixture's closed form (pattern 0/2 peak = |P|,
      // pattern 3 is the only stereo pattern)
      val q40 = graft.SparkEntry.queries("q40_audio_flac")(spark, "/root/testdata/sf0.001")
      val badFlac = q40.where(
        $"n_frames" =!= (lit(64) + ($"doc_id" % 16) * 2) * 2 ||
          $"ch" =!= when($"doc_id" % 4 === 3, 2L).otherwise(1L) ||
          ($"doc_id" % 4 === 0 && $"peak" =!= abs(($"doc_id" * 97) % 16000 - 8000)) ||
          ($"doc_id" % 4 === 2 && $"peak" =!= abs(($"doc_id" * 97) % 16000 - 8000)))
      assert(badFlac.isEmpty, "q40 flac features diverge from closed form")
      println(s"SMOKE flac: q40_rows=${q40.count()} matches closed form")
      // MS ADPCM (q44): the 2-tap LPC codec through the distributed query;
      // gate against the fixture's closed form (pattern 1 ramps into the
      // +32767 clamp; pattern 2 is the only stereo pattern)
      val q44 = graft.SparkEntry.queries("q44_audio_msadpcm")(spark, "/root/testdata/sf0.001")
      val badMs = q44.where(
        $"ch" =!= when($"doc_id" % 3 === 2, 2L).otherwise(1L) ||
          ($"doc_id" % 3 === 1 && $"peak" =!= 32768) ||
          ($"doc_id" % 3 === 0 && // blocks are (P, P+9) and (−P, −P+9)
            $"peak" =!= greatest(abs(($"doc_id" * 113) % 18000 - 9000),
              abs(($"doc_id" * 113) % 18000 - 9000 + 9),
              abs(($"doc_id" * 113) % 18000 - 9000 - 9))))
      assert(badMs.isEmpty, "q44 msadpcm features diverge from closed form")
      println(s"SMOKE msadpcm: q44_rows=${q44.count()} matches closed form")
      // QOI (q45): the JDK-less image codec through the distributed query
      // and the ImageOps sniffing dispatch; lossless → exact checksum
      val q45 = graft.SparkEntry.queries("q45_image_qoi")(spark, "/root/testdata/sf0.001")
      val badQoi = q45.where($"w" =!= 16 || $"h" =!= 16 || $"peak" < 0)
      assert(badQoi.isEmpty, "q45 qoi decode diverges from closed form")
      println(s"SMOKE qoi: q45_rows=${q45.count()} decodes losslessly")
      // big-endian containers (q46): the 80-bit AIFF rate field and AU's
      // variable offset through the distributed dispatch
      val q46 = graft.SparkEntry.queries("q46_audio_bigendian")(spark, "/root/testdata/sf0.001")
      val badBe = q46.where(
        $"codec" =!= when($"doc_id" % 2 === 0, 1L)
          .otherwise(when($"doc_id" % 4 === 1, 7L).otherwise(6L)) ||
          ($"doc_id" % 2 === 0 && $"sr" =!= lit(8000) + ($"doc_id" % 5) * 1000) ||
          ($"doc_id" % 2 === 0 && $"peak" =!= lit(900) + ($"doc_id" % 90) * 37))
      assert(badBe.isEmpty, "q46 big-endian audio diverges from closed form")
      println(s"SMOKE aiff+au: q46_rows=${q46.count()} matches closed form")
      // uncompressed DIB/AVI (q47): stride/row-order/BGR through the
      // distributed dispatch; lossless → positive checksums, exact dims
      val q47 = graft.SparkEntry.queries("q47_video_dib")(spark, "/root/testdata/sf0.001")
      val badDib = q47.where($"w" =!= 6 || $"h" =!= 5 || $"checksum" < 0)
      assert(badDib.isEmpty, "q47 dib decode diverges from closed form")
      println(s"SMOKE dib: q47_rows=${q47.count()} decodes losslessly")
      // WebP lossless / VP8L (q48): the prefix-code + LZ77 + transform
      // bitstream through the distributed dispatch — exact checksum per
      // the fixture formula, and the batch thumbnail operator over webp
      // payloads (registry + magic sniff on the executor path)
      val webps = spark.range(24).select(
        concat(lit("w"), $"id").as("image_id"),
        udf((d: Long) => graft.fixtures.FixtureGen.webpBytes(d)).apply($"id").as("bytes"),
        lit("webp").as("fmt"))
      val webpThumbs = graft.operators.ImageBatch.thumbnails(webps, 4, 4)
        .where($"w" === 21 && $"h" === 13 && $"thumb".isNotNull).count()
      assert(webpThumbs == 24, s"webp thumbs=$webpThumbs")
      val q48 = graft.SparkEntry.queries("q48_image_webp")(spark, "/root/testdata/sf0.001")
      // peak: y∈{8,11} maximizes 5·(y/4)+x·(y%3) at 10+40=50; never wraps
      val badWebp = q48.where($"w" =!= 21 || $"h" =!= 13 || $"peak" =!=
        lit(20) + ($"doc_id" * 29) % 170 + 50)
      assert(badWebp.isEmpty, "q48 webp decode diverges from closed form")
      println(s"SMOKE webp: thumbs=$webpThumbs q48_rows=${q48.count()} match closed form")
      // animated GIF (q41): LZW decode + compositing through the same
      // distributed dispatch; lossless → gray equals the formula exactly
      val gifs = spark.range(24).select(
        concat(lit("g"), $"id").as("video_id"),
        udf((d: Long) => graft.fixtures.FixtureGen.gifBytes(d)).apply($"id").as("bytes"))
      val gifFrames = graft.operators.ImageBatch.videoFrames(gifs, 4)
        .where($"w" === 16 && $"h" === 16 && $"frame".isNotNull).count()
      val gifExpect = (0L until 24L).map(d => d % 3 + 1).sum
      assert(gifFrames == gifExpect, s"gif frames=$gifFrames expected=$gifExpect")
      val q41 = graft.SparkEntry.queries("q41_video_gif")(spark, "/root/testdata/sf0.001")
      val badGif = q41.where(
        $"gray" =!= lit(12) + ($"doc_id" * 37 + $"frame_idx" * 11) % 232)
      assert(badGif.isEmpty, "q41 gif decode diverges from closed form")
      println(s"SMOKE gif: frames=$gifFrames q41_rows=${q41.count()} match closed form")
      // APNG (q42): the acTL/fcTL/fdAT walk + per-frame PNG synthesis
      // through the same dispatch; lossless → gray equals the formula
      val q42 = graft.SparkEntry.queries("q42_video_apng")(spark, "/root/testdata/sf0.001")
      val badApng = q42.where(
        $"gray" =!= lit(14) + ($"doc_id" * 41 + $"frame_idx" * 17) % 230)
      assert(badApng.isEmpty, "q42 apng decode diverges from closed form")
      println(s"SMOKE apng: q42_rows=${q42.count()} matches closed form")
      // animated WebP (q49): VP8X/ANIM/ANMF walk + per-frame VP8L decode
      // through the same dispatch — INTER-FRAME patches, so bg_gray is
      // only right if compositing retained the frame-0 canvas
      val q49 = graft.SparkEntry.queries("q49_video_animwebp")(spark, "/root/testdata/sf0.001")
      val badAnimWebp = q49.where(
        $"bg_gray" =!= lit(16) + ($"doc_id" * 47) % 224 ||
        $"patch_gray" =!= when($"frame_idx" === 0, lit(16) + ($"doc_id" * 47) % 224)
          .otherwise(lit(16) + ($"doc_id" * 47 + $"frame_idx" * 23) % 224))
      assert(badAnimWebp.isEmpty, "q49 animated-webp decode diverges from closed form")
      println(s"SMOKE animwebp: q49_rows=${q49.count()} matches closed form")
      // ICO favicons (q50): ICONDIR walk + DIB depths + best-member
      // selection through the distributed dispatch, plus the batch
      // thumbnail operator over ico payloads (registry + magic sniff)
      val icos = spark.range(24).select(
        concat(lit("i"), $"id").as("image_id"),
        udf((d: Long) => graft.fixtures.FixtureGen.icoBytes(d)).apply($"id").as("bytes"),
        lit("ico").as("fmt"))
      val icoThumbs = graft.operators.ImageBatch.thumbnails(icos, 4, 4)
        .where($"w" === 18 && $"h" === 11 && $"thumb".isNotNull).count()
      assert(icoThumbs == 24, s"ico thumbs=$icoThumbs")
      val q50 = graft.SparkEntry.queries("q50_image_ico")(spark, "/root/testdata/sf0.001")
      // position-weighted sums of the two quadrant regions — the checksum
      // check is what catches pixel-PERMUTING bugs (peak/dims cannot)
      val icoWeights = for { y <- 0 until 11; x <- 0 until 18 }
        yield ((x < 9) == (y < 6), 1L + x + 18L * y)
      val sGa = icoWeights.collect { case (true, v) => v }.sum
      val sGb = icoWeights.collect { case (false, v) => v }.sum
      val badIco = q50.where($"w" =!= 18 || $"h" =!= 11 || $"n_members" =!= 2 ||
        $"peak" =!= greatest(lit(24) + ($"doc_id" * 31) % 200,
          lit(16) + ($"doc_id" * 37) % 224) ||
        $"checksum" =!= (lit(24) + ($"doc_id" * 31) % 200) * sGa +
          (lit(16) + ($"doc_id" * 37) % 224) * sGb)
      assert(badIco.isEmpty, "q50 ico decode diverges from closed form")
      println(s"SMOKE ico: thumbs=$icoThumbs q50_rows=${q50.count()} match closed form")
      // TGA textures (q51): registry-fmt dispatch (TGA has no magic
      // bytes); quadrant checksum catches origin-flip/RLE/palette slips
      val q51 = graft.SparkEntry.queries("q51_image_tga")(spark, "/root/testdata/sf0.001")
      val tgaWeights = for { y <- 0 until 10; x <- 0 until 17 }
        yield ((x < 8) == (y < 5), 1L + x + 17L * y)
      val tGa = tgaWeights.collect { case (true, v) => v }.sum
      val tGb = tgaWeights.collect { case (false, v) => v }.sum
      val badTga = q51.where($"w" =!= 17 || $"h" =!= 10 ||
        $"checksum" =!= (lit(28) + ($"doc_id" * 41) % 200) * tGa +
          (lit(12) + ($"doc_id" * 53) % 228) * tGb)
      assert(badTga.isEmpty, "q51 tga decode diverges from closed form")
      println(s"SMOKE tga: q51_rows=${q51.count()} matches closed form")
      // MP3 frame-header metadata (q52): duration/rate/channel bucketing
      // without sample decode — the ffprobe-shaped pipeline op
      val q52 = graft.SparkEntry.queries("q52_audio_mp3meta")(spark, "/root/testdata/sf0.001")
      val badMp3 = q52.where($"n_frames" =!= lit(40) + $"doc_id" % 30 ||
        $"duration_ms" =!= expr("n_frames * 1152000 div sample_rate") ||
        $"sample_rate" < 0)
      assert(badMp3.isEmpty, "q52 mp3 metadata diverges from closed form")
      println(s"SMOKE mp3meta: q52_rows=${q52.count()} matches closed form")
      // MP4 box-walk metadata (q53): brand/duration/codec/dims bucketing
      // for the web's dominant video container, no sample decode
      val q53 = graft.SparkEntry.queries("q53_video_mp4meta")(spark, "/root/testdata/sf0.001")
      val badMp4 = q53.where($"n_video_samples" =!= lit(24) + $"doc_id" % 48 ||
        $"duration_ms" =!= $"n_video_samples" * 40 ||
        $"w" =!= lit(160) + lit(16) * ($"doc_id" % 28) ||
        $"audio_channels" =!= lit(1) + $"doc_id" % 2)
      assert(badMp4.isEmpty, "q53 mp4 metadata diverges from closed form")
      println(s"SMOKE mp4meta: q53_rows=${q53.count()} matches closed form")
      // JPEG/EXIF metadata (q54): SOF dims + camera fields + has_gps —
      // the PII-scrub signal before publishing crawled images
      val q54 = graft.SparkEntry.queries("q54_image_exif")(spark, "/root/testdata/sf0.001")
      val badExif = q54.where($"w" =!= lit(24) + $"doc_id" % 40 ||
        $"orientation" =!= lit(1) + $"doc_id" % 8 ||
        $"iso" =!= lit(100) * (lit(1) + $"doc_id" % 16) ||
        $"has_gps" =!= ($"doc_id" % 3 === 0))
      assert(badExif.isEmpty, "q54 exif metadata diverges from closed form")
      println(s"SMOKE exif: q54_rows=${q54.count()} matches closed form")
      // Ogg Vorbis/Opus metadata (q55): page walk + CRC + granule duration
      val q55 = graft.SparkEntry.queries("q55_audio_oggmeta")(spark, "/root/testdata/sf0.001")
      val badOgg = q55.where($"n_pages" =!= lit(5) + $"doc_id" % 5 ||
        $"duration_ms" =!= when($"doc_id" % 2 === 0,
          lit(10) * (lit(20) + $"doc_id" % 30))
          .otherwise(lit(100) * (lit(10) + $"doc_id" % 90)) ||
        $"channels" =!= expr("1 + (doc_id % 6) div 3"))
      assert(badOgg.isEmpty, "q55 ogg metadata diverges from closed form")
      println(s"SMOKE oggmeta: q55_rows=${q55.count()} matches closed form")
      // Matroska/WebM EBML metadata (q56): the royalty-free web container
      val q56 = graft.SparkEntry.queries("q56_video_mkvmeta")(spark, "/root/testdata/sf0.001")
      val badMkv = q56.where(
        $"duration_ms" =!= lit(5000) + lit(250) * ($"doc_id" % 37) ||
        $"w" =!= lit(320) + lit(16) * ($"doc_id" % 20) ||
        $"audio_channels" =!= lit(1) + $"doc_id" % 2 ||
        ($"doc_id" % 2 === 0 && $"doc_type" =!= "webm"))
      assert(badMkv.isEmpty, "q56 mkv metadata diverges from closed form")
      println(s"SMOKE mkvmeta: q56_rows=${q56.count()} matches closed form")
      // Media triage (q57): content-sniffed dispatch across all 12
      // container families — kind routing is the new surface; TGA
      // (fam 11) must be honestly unknown, single-frame GIFs image
      val q57 = graft.SparkEntry.queries("q57_media_triage")(spark, "/root/testdata/sf0.001")
      val badTriage = q57.where(
        ($"doc_id" % 12 === 11 && $"kind" =!= "unknown") ||
        ($"doc_id" % 12 === 0 && $"kind" =!= "image") ||
        ($"doc_id" % 12 === 3 && ($"kind" =!= "audio" || $"container" =!= "ogg")) ||
        ($"doc_id" % 12 === 6 && ($"kind" =!= "video" || $"w" =!= 8)) ||
        ($"doc_id" % 12 === 7 &&
          $"kind" =!= when(expr("(doc_id div 12) % 3") === 0, "image").otherwise("video")))
      assert(badTriage.isEmpty, "q57 triage diverges from closed form")
      val kinds = q57.groupBy("kind").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(Set("image", "video", "audio", "unknown").subsetOf(kinds.keySet),
        s"q57 kinds incomplete: $kinds")
      println(s"SMOKE triage: q57_rows=${q57.count()} kinds=$kinds")
      // HEIF/AVIF metadata (q58): the ISO-BMFF ITEM grammar — dims must
      // resolve through ipma associations, brand must split from movie MP4
      val q58 = graft.SparkEntry.queries("q58_image_heif")(spark, "/root/testdata/sf0.001")
      val badHeif = q58.where(
        $"w" =!= lit(64) + lit(4) * ($"doc_id" % 50) ||
        $"h" =!= lit(48) + lit(2) * ($"doc_id" % 60) ||
        $"rotation" =!= lit(90) * ($"doc_id" % 4) ||
        $"has_exif" =!= ($"doc_id" % 3 === 0) ||
        ($"doc_id" % 2 === 0 && $"brand" =!= "avif"))
      assert(badHeif.isEmpty, "q58 heif metadata diverges from closed form")
      println(s"SMOKE heif: q58_rows=${q58.count()} matches closed form")
      // SVG metadata (q59): dims via CSS units/viewBox + the scrub signals
      val q59 = graft.SparkEntry.queries("q59_image_svg")(spark, "/root/testdata/sf0.001")
      val badSvg = q59.where(
        $"has_script" =!= ($"doc_id" % 3 === 0 || $"doc_id" % 7 === 0) ||
        $"has_external_ref" =!= ($"doc_id" % 5 === 0) ||
        ($"doc_id" % 4 === 3 && $"w" =!= lit(4) * (lit(25) + $"doc_id" % 60)) ||
        ($"doc_id" % 4 =!= 3 && $"w" =!= lit(100) + $"doc_id" % 200))
      assert(badSvg.isEmpty, "q59 svg metadata diverges from closed form")
      println(s"SMOKE svg: q59_rows=${q59.count()} matches closed form")
      // Distributed triage operator: binary column in, typed rows out,
      // shuffle-free — the first stage a pipeline runs on fetched bytes
      val mediaDf = spark.range(36).select(
        concat(lit("m"), $"id").as("media_id"),
        udf((d: Long) => (d % 3) match {
          case 0 => graft.fixtures.FixtureGen.jpegExifBytes(d)
          case 1 => graft.fixtures.FixtureGen.oggBytes(d)
          case _ => graft.fixtures.FixtureGen.mkvBytes(d)
        }).apply($"id").as("bytes"))
      val triaged = graft.operators.ImageBatch.triage(mediaDf)
      assert(!triaged.queryExecution.executedPlan.toString.contains("Exchange"),
        "triage must stay a narrow map")
      val triageKinds = triaged.groupBy("kind").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(triageKinds == Map("image" -> 12L, "audio" -> 12L, "video" -> 12L),
        s"triage kinds off: $triageKinds")
      println(s"SMOKE triage-op: kinds=$triageKinds shuffle-free")
      // RLE8/AVI (q43): the INTER-FRAME delta codec through the same
      // distributed dispatch — bg_gray is only right if compositing
      // retained the keyframe canvas under the delta frames' skips
      val rles = spark.range(24).select(
        concat(lit("r"), $"id").as("video_id"),
        udf((d: Long) => graft.fixtures.FixtureGen.aviRleBytes(d)).apply($"id").as("bytes"))
      val rleFrames = graft.operators.ImageBatch.videoFrames(rles, 4)
        .where($"w" === 16 && $"h" === 16 && $"frame".isNotNull).count()
      val rleExpect = (0L until 24L).map(d => d % 3 + 1).sum
      assert(rleFrames == rleExpect, s"rle frames=$rleFrames expected=$rleExpect")
      val q43 = graft.SparkEntry.queries("q43_video_rle")(spark, "/root/testdata/sf0.001")
      val badRle = q43.where(
        $"bg_gray" =!= lit(20) + ($"doc_id" * 43) % 225 ||
        $"patch_gray" =!= when($"frame_idx" === 0, lit(20) + ($"doc_id" * 43) % 225)
          .otherwise(lit(20) + ($"doc_id" * 43 + $"frame_idx" * 19) % 225))
      assert(badRle.isEmpty, "q43 inter-frame RLE8 decode diverges from closed form")
      println(s"SMOKE rle8: frames=$rleFrames q43_rows=${q43.count()} match closed form")
      // PDF metadata (q60): the xref walk end-to-end over all four wire
      // forms — page count, scrub signals, and the parser-path proof cols
      val q60 = graft.SparkEntry.queries("q60_doc_pdf")(spark, "/root/testdata/sf0.001")
      val badPdf = q60.where(
        $"n_pages" =!= lit(1) + $"doc_id" % 9 ||
        $"version" =!= concat(lit("1."), (lit(4) + $"doc_id" % 4).cast("string")) ||
        $"has_js" =!= ($"doc_id" % 7 === 0 || $"doc_id" % 11 === 0 || $"doc_id" % 3 === 2) ||
        $"xref_kind" =!= when($"doc_id" % 3 === 0, "stream").otherwise("table") ||
        $"incremental" =!= ($"doc_id" % 3 === 2))
      assert(badPdf.isEmpty, "q60 pdf metadata diverges from closed form")
      println(s"SMOKE pdf: q60_rows=${q60.count()} match closed form")
      // WARC archives (q61): the record grammar + gzip members + digest
      // verification, plus the records/sink operators end to end
      val q61 = graft.SparkEntry.queries("q61_archive_warc")(spark, "/root/testdata/sf0.001")
      val badWarc = q61.where(
        $"n_records" =!= lit(3) +
          when($"doc_id" % 5 === 0, 1).otherwise(0) +
          when($"doc_id" % 7 === 0, 1).otherwise(0) ||
        $"http_status" =!= when($"doc_id" % 13 === 0, 404).otherwise(200) ||
        $"digest_ok" =!= ($"doc_id" % 17 =!= 0))
      assert(badWarc.isEmpty, "q61 warc metadata diverges from closed form")
      val sinkDir = graft.util.TempDirs.create("smoke-warc").toString
      val pages = spark.range(20).select(
        concat(lit("https://smoke.test/p/"), $"id").as("url"),
        lit(200).as("status"), lit("text/html").as("content_type"),
        $"id".cast("string").cast("binary").as("body"),
        lit("2026-08-19T00:00:00Z").as("fetched_at")).repartition(2)
      val manifest = graft.operators.Archive.sink(pages, sinkDir).collect()
      assert(manifest.map(_.getLong(1)).sum == 20, "warc sink lost records")
      val archives = spark.createDataset(manifest.toSeq.map(m =>
        (m.getString(0), java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(m.getString(0))))))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.BINARY))
        .toDF("archive_id", "bytes")
      val backRows = graft.operators.Archive.records(archives)
      assert(backRows.count() == 20 &&
        backRows.where(!$"digest_ok").isEmpty,
        "warc sink→records round-trip diverges")
      println(s"SMOKE warc: q61_rows=${q61.count()} sink_roundtrip=20 ok")
      // DOCX documents (q62): ZIP central-directory walk (incl. zip64)
      // + WordprocessingML counts and scrub signals
      val q62 = graft.SparkEntry.queries("q62_doc_docx")(spark, "/root/testdata/sf0.001")
      val badDocx = q62.where(
        $"n_words" =!= (lit(1) + $"doc_id" % 6) * (lit(2) + $"doc_id" % 5) ||
        $"has_macros" =!= ($"doc_id" % 11 === 0) ||
        $"has_external_ref" =!= ($"doc_id" % 7 === 0) ||
        $"doc_method" =!= when($"doc_id" % 2 === 0, "stored").otherwise("deflate") ||
        $"zip64" =!= ($"doc_id" % 13 === 0))
      assert(badDocx.isEmpty, "q62 docx metadata diverges from closed form")
      println(s"SMOKE docx: q62_rows=${q62.count()} match closed form")
      // document triage (q63): pdf/warc/docx route as kind=document, the
      // wav control stays audio
      val q63 = graft.SparkEntry.queries("q63_doc_triage")(spark, "/root/testdata/sf0.001")
      val badTri = q63.where(
        $"kind" =!= when($"doc_id" % 4 === 3, "audio").otherwise("document") ||
        $"container" =!= when($"doc_id" % 4 === 0, "pdf")
          .when($"doc_id" % 4 === 1, "warc")
          .when($"doc_id" % 4 === 2, "docx").otherwise("wav"))
      assert(badTri.isEmpty, "q63 document triage diverges from closed form")
      println(s"SMOKE doc-triage: q63_rows=${q63.count()} match closed form")
      // CDX indexing (q64): SURT keys + replayed offsets over the WARC
      // fixture, plus the distributed cdx operator over sink output
      val q64 = graft.SparkEntry.queries("q64_archive_cdx")(spark, "/root/testdata/sf0.001")
      val badCdx = q64.where(
        $"surt" =!= concat(lit("test,host-"), $"doc_id" % 9,
          lit(")/page/"), $"doc_id") ||
        !$"replay_ok" || $"n_lines" =!= 1)
      assert(badCdx.isEmpty, "q64 cdx index diverges from closed form")
      val cdxIdx = graft.operators.Archive.cdx(archives)
        .orderBy("surt_key", "ts").collect()
      assert(cdxIdx.length == 20 && cdxIdx.forall(_.getLong(6) >= 0),
        "cdx over sink output must index every written record")
      println(s"SMOKE cdx: q64_rows=${q64.count()} sink_index=${cdxIdx.length} ok")
      // WET round-trip (q65): the documents text through conversion
      // records and back, byte-exact
      val q65 = graft.SparkEntry.queries("q65_archive_wet")(spark, "/root/testdata/sf0.001")
      val badWet = q65.where(!$"roundtrip_ok" || $"text_len" < 0)
      assert(badWet.isEmpty, "q65 wet round-trip diverges")
      println(s"SMOKE wet: q65_rows=${q65.count()} round-trip exact")
      // WebDataset shards (q66): ustar walk + first-dot sample grouping
      val q66 = graft.SparkEntry.queries("q66_webdataset")(spark, "/root/testdata/sf0.001")
      val badWds = q66.where(
        $"n_samples" =!= lit(1) + $"doc_id" % 4 ||
        $"caption_chars" =!= (lit(1) + $"doc_id" % 4) * (lit(3) + $"doc_id" % 6) ||
        !$"keys_ok")
      assert(badWds.isEmpty, "q66 webdataset diverges from closed form")
      println(s"SMOKE wds: q66_rows=${q66.count()} match closed form")
      // modern-codec stream metadata (q67-q69): ADTS chains, H.264 SPS
      // with crop math, IVF walked-not-trusted frame counts
      val q67 = graft.SparkEntry.queries("q67_audio_aacmeta")(spark, "/root/testdata/sf0.001")
      assert(q67.where($"n_frames" =!= lit(3) + $"doc_id" % 6 ||
        $"channels" =!= lit(1) + $"doc_id" % 5).isEmpty,
        "q67 adts diverges from closed form")
      val q68 = graft.SparkEntry.queries("q68_video_h264")(spark, "/root/testdata/sf0.001")
      assert(q68.where($"width" =!= lit(160) + lit(2) * ($"doc_id" % 120) ||
        $"height" =!= lit(180) + lit(2) * ($"doc_id" % 100)).isEmpty,
        "q68 h264 sps dims diverge (crop math)")
      val q69 = graft.SparkEntry.queries("q69_video_ivf")(spark, "/root/testdata/sf0.001")
      assert(q69.where($"counts_agree" =!= ($"doc_id" % 6 =!= 0)).isEmpty,
        "q69 ivf walked-count truth diverges")
      val q70 = graft.SparkEntry.queries("q70_video_vp9")(spark, "/root/testdata/sf0.001")
      assert(q70.where($"width" =!= lit(176) + lit(2) * ($"doc_id" % 160) ||
        $"container_agrees" =!= ($"doc_id" % 5 =!= 0)).isEmpty,
        "q70 vp9 bitstream-truth diverges")
      val q71 = graft.SparkEntry.queries("q71_video_av1")(spark, "/root/testdata/sf0.001")
      assert(q71.where($"height" =!= lit(96) + lit(2) * ($"doc_id" % 140) ||
        $"container_agrees" =!= ($"doc_id" % 7 =!= 0)).isEmpty,
        "q71 av1 bitstream-truth diverges")
      println(s"SMOKE codec-meta: q67=${q67.count()} q68=${q68.count()} q69=${q69.count()} q70=${q70.count()} q71=${q71.count()} match closed form")
      // WET→analysis pipeline transparency (q72): lang/quality/tokens
      // over archive-round-tripped text equal the direct q18/q19/q20
      val q72 = graft.SparkEntry.queries("q72_wet_pipeline")(spark, "/root/testdata/sf0.001")
      val q18c = graft.SparkEntry.queries("q18_langid")(spark, "/root/testdata/sf0.001")
      val joined = q72.alias("p").join(q18c.alias("d"), "doc_id")
        .where($"p.lang_pred" =!= $"d.lang_pred")
      assert(joined.isEmpty, "q72 pipeline lang diverges from direct q18")
      println(s"SMOKE wet-pipeline: q72_rows=${q72.count()} transparent vs direct analysis")
    }

    // full engine drive: crawl the synthetic web end-to-end
    val params = graft.fixtures.FixtureGen.Params(hosts = 2, pagesPerHost = 40)
    val cfg = graft.model.CrawlConfig(
      seedUrls = graft.fixtures.FixtureGen.seeds(params), maxDepth = 6)
    val io = new graft.sources.ParquetSnapshotTableIO(
      spark, java.nio.file.Files.createTempDirectory("graft-smoke").toString)
    val engine = new graft.epoch.CrawlEngine(spark, cfg,
      new graft.sources.FixtureFetcher(graft.fixtures.FixtureGen.webGraphDF(spark, params)),
      graft.fixtures.FixtureGen.imagesDF(spark, params), io,
      graft.fixtures.FixtureGen.robotsMap(params))
    engine.run()
    println(s"SMOKE engine: seen=${engine.seen.count()} order=${engine.orderLog.count()} " +
      s"fetched=${engine.fetched.count()} counters=${io.lastCounters}")
    engine.orderLog.orderBy($"host", $"priority").show(8, truncate = false)

    // the crawl's fetched table → replayable WARC + CDX index (the
    // archival seam a finished crawl hands to any web-archive tool)
    val warcOut = graft.util.TempDirs.create("smoke-engine-warc").toString
    val fm = graft.operators.Archive.fromFetched(
      engine.fetched, warcOut, "2026-08-19T00:00:00Z").collect()
    val fetchedN = engine.fetched.count()
    assert(fm.map(_.getLong(1)).sum == fetchedN, "archival lost fetched rows")
    val engArch = spark.createDataset(fm.toSeq.map(m =>
      (m.getString(0), java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(m.getString(0))))))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY))
      .toDF("archive_id", "bytes")
    val engIdx = graft.operators.Archive.cdx(engArch)
    assert(engIdx.count() == fetchedN &&
      engIdx.where($"surt_key" === "corrupt").isEmpty,
      "engine archive must index completely")
    println(s"SMOKE archive: fetched=$fetchedN -> warc_files=${fm.length} cdx_rows=$fetchedN")

    // the same fetched table → WebDataset training shards (the terminal
    // hand-off to a training loader), read back sample-exact
    val wdsOut = graft.util.TempDirs.create("smoke-engine-wds").toString
    val wm = graft.operators.Webdataset.fromFetched(engine.fetched, wdsOut).collect()
    assert(wm.map(_.getLong(1)).sum == fetchedN, "wds shards lost samples")
    val shards = spark.createDataset(wm.toSeq.map(m =>
      (m.getString(0), java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(m.getString(0))))))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY))
      .toDF("shard_id", "bytes")
    val samplesBack = graft.operators.Webdataset.samples(shards)
    assert(samplesBack.count() == fetchedN &&
      samplesBack.where($"caption".isNull || $"image".isNull).isEmpty,
      "every shipped sample must carry image AND caption")
    println(s"SMOKE wds-ship: fetched=$fetchedN -> shards=${wm.length} samples=$fetchedN")

    val n = canon.where($"canon".startsWith("https://site-")).count()
    println(s"SMOKE_OK canonicalized=$n of ${urls.count()}")
    spark.stop()
  }
}
