package graft

import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.operators.{BatchedScorer, DepthHeuristicScorer, IdentityScorer, Preflight, Relevance, RelevanceScorer, Ssrf}
import graft.sources.{DecoderRegistry, Sitemaps}
import graft.streaming.EventsStreaming

/** S1 sitemap expansion, F6 SSRF, F8 relevance stage, X1 decoder registry,
  * §2.8 streaming. */
class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def urlset(urls: String*): Array[Byte] =
    (s"""<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |${urls.map(u => s"<url><loc>$u</loc></url>").mkString("\n")}
        |</urlset>""".stripMargin).getBytes("UTF-8")

  private def index(children: String*): Array[Byte] =
    (s"""<?xml version="1.0" encoding="UTF-8"?>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |${children.map(u => s"<sitemap><loc>$u</loc></sitemap>").mkString("\n")}
        |</sitemapindex>""".stripMargin).getBytes("UTF-8")

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }

  test("sitemap parse: urlset, index, gzip, invalid XML tolerance") {
    val (u1, c1) = Sitemaps.parse(urlset("https://a.test/docs/x", "https://a.test/docs/y"), gzipped = false)
    assert(u1 == Seq("https://a.test/docs/x", "https://a.test/docs/y") && c1.isEmpty)
    val (u2, c2) = Sitemaps.parse(index("https://a.test/sm1.xml"), gzipped = false)
    assert(u2.isEmpty && c2 == Seq("https://a.test/sm1.xml"))
    val (u3, c3) = Sitemaps.parse(gz(urlset("https://a.test/docs/z")), gzipped = true)
    assert(u3 == Seq("https://a.test/docs/z"))
    val (u4, c4) = Sitemaps.parse("<not-xml!!<<".getBytes, gzipped = false)
    assert(u4.isEmpty && c4.isEmpty)
    // XXE: entity declarations rejected outright, never expanded
    val evil = """<?xml version="1.0"?><!DOCTYPE x [<!ENTITY e SYSTEM "file:///etc/passwd">]>
                 |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>&e;</loc></url></urlset>"""
      .stripMargin.getBytes
    val (u5, _) = Sitemaps.parse(evil, gzipped = false)
    assert(u5.isEmpty)
  }

  test("sitemap parse: entity-free DOCTYPE tolerated (defusedxml default); entities rejected") {
    // defusedxml defaults: forbid_dtd=False, forbid_entities=True — an
    // entity-free DOCTYPE-bearing sitemap must parse (round-2 rejected it)
    val withDoctype =
      ("""<?xml version="1.0"?><!DOCTYPE urlset>""" +
        """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
        """<url><loc>https://a.test/docs/d1</loc></url></urlset>""").getBytes
    val (u, _) = Sitemaps.parse(withDoctype, gzipped = false)
    assert(u == Seq("https://a.test/docs/d1"))
    // internal-subset DOCTYPE without entities also parses
    val withSubset =
      ("""<!DOCTYPE urlset [<!ELEMENT x (#PCDATA)>]>""" +
        """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
        """<url><loc>https://a.test/docs/d2</loc></url></urlset>""").getBytes
    assert(Sitemaps.parse(withSubset, gzipped = false)._1 == Seq("https://a.test/docs/d2"))
    // any ENTITY declaration → rejected outright (EntitiesForbidden analog)
    val withEntity =
      ("""<!DOCTYPE urlset [<!ENTITY e "x">]>""" +
        """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
        """<url><loc>https://a.test/docs/d3</loc></url></urlset>""").getBytes
    assert(Sitemaps.parse(withEntity, gzipped = false)._1.isEmpty)
  }

  test("sitemap expandAll: URL on host B found only in host A's chain is NOT admitted") {
    // expandPure(A) rejects it (netloc != A) and expandPure(B) never walks
    // A's chain — the distributed expansion must agree (round-2 admitted it)
    val rows = Seq(
      ("https://a.test/sitemap.xml",
        urlset("https://a.test/docs/own", "https://b.test/docs/foreign"), false),
      ("https://b.test/sitemap.xml",
        urlset("https://b.test/docs/own"), false))
      .toDF("sitemap_url", "body", "gzipped")
    val seeds = Map("a.test" -> "https://a.test/docs", "b.test" -> "https://b.test/docs")
    val got = Sitemaps.expandAll(rows, seeds)
      .select("urlNorm").as[String].collect().toSet
    assert(got == Set("https://a.test/docs/own", "https://b.test/docs/own"),
      s"cross-host sitemap URL leaked: $got")
    val bodies = rows.as[(String, Array[Byte], Boolean)].collect()
      .map { case (u, b, g) => u -> (b, g) }.toMap
    assert(got == Sitemaps.expandPure(bodies, "a.test", "https://a.test/docs") ++
      Sitemaps.expandPure(bodies, "b.test", "https://b.test/docs"))
  }

  test("sitemap expandAll: nested index + gzip + domain/path filter + canonicalize") {
    val rows = Seq(
      ("https://a.test/sitemap.xml", index("https://a.test/sm1.xml", "https://a.test/sm2.xml.gz"), false),
      ("https://a.test/sm1.xml",
        urlset("https://a.test/docs/P1/", "https://a.test/docs/p2#frag",
          "https://OTHER.test/docs/p3", "https://a.test/outside/p4"), false),
      ("https://a.test/sm2.xml.gz", gz(urlset("https://a.test/docs/p5")), true))
      .toDF("sitemap_url", "body", "gzipped")
    val seeds = Map("a.test" -> "https://a.test/docs")
    val got = Sitemaps.expandAll(rows, seeds)
      .orderBy("urlNorm").select("urlNorm").as[String].collect().toSeq
    assert(got == Seq("https://a.test/docs/P1", "https://a.test/docs/p2", "https://a.test/docs/p5"))
    // pure traversal agrees (the simulator's path)
    val bodies = rows.as[(String, Array[Byte], Boolean)].collect()
      .map { case (u, b, g) => u -> (b, g) }.toMap
    assert(Sitemaps.expandPure(bodies, "a.test", "https://a.test/docs") == got.toSet)
  }

  test("SSRF: literal private IPs rejected, names pass without resolver") {
    assert(Ssrf.isSsrf("http://127.0.0.1/x"))
    assert(Ssrf.isSsrf("http://10.2.3.4/x"))
    assert(Ssrf.isSsrf("http://192.168.1.1:8080/x"))
    assert(Ssrf.isSsrf("http://169.254.1.1/x"))
    assert(Ssrf.isSsrf("http://172.16.0.9/x"))
    assert(Ssrf.isSsrf("http://[::1]/x"))
    assert(Ssrf.isSsrf("http://[fc00::1]/x"))
    assert(!Ssrf.isSsrf("http://93.184.216.34/x"))
    assert(!Ssrf.isSsrf("https://example.com/x")) // no DNS in sandbox
    // with a resolver fixture
    val resolver = Map("evil.test" -> "10.0.0.1", "ok.test" -> "93.184.216.34")
    def res(h: String) = resolver.get(h).map(java.net.InetAddress.getByName)
    assert(Ssrf.isSsrf("https://evil.test/x", res))
    assert(!Ssrf.isSsrf("https://ok.test/x", res))
    val df = Seq("http://127.0.0.1/x", "https://fine.test/y").toDF("url")
    assert(Ssrf.filter(df, $"url").count() == 1)
  }

  test("relevance stage: identity keeps lexicographic order; scorer output semi-joined") {
    val cands = Seq(
      ("https://a.test/b", "a.test"), ("https://a.test/a/deep/path", "a.test"),
      ("https://a.test/c", "a.test")).toDF("urlNorm", "host")
    val id = Relevance.prioritize(cands, IdentityScorer)
      .orderBy("priority").select("urlNorm").as[String].collect().toSeq
    assert(id == Seq("https://a.test/a/deep/path", "https://a.test/b", "https://a.test/c"))
    val heur = Relevance.prioritize(cands, DepthHeuristicScorer)
      .orderBy("priority").select("urlNorm").as[String].collect().toSeq
    assert(heur == Seq("https://a.test/b", "https://a.test/c", "https://a.test/a/deep/path"))
  }

  test("X2 batched scorer: batch calls, failure fallback, hallucination drop") {
    val cands = Seq(
      ("https://a.test/long-url-path", "a.test"), ("https://a.test/ab", "a.test"),
      ("https://a.test/medium", "a.test"), ("https://a.test/z", "a.test"))
      .toDF("urlNorm", "host")
    // deterministic "LLM": score = url length (shorter = better priority)
    val byLen = new BatchedScorer(2, urls => urls.map(_.length.toDouble))
    val got = Relevance.prioritize(cands, byLen)
      .orderBy("priority").select("urlNorm").as[String].collect().toSeq
    assert(got == Seq("https://a.test/z", "https://a.test/ab",
      "https://a.test/medium", "https://a.test/long-url-path"))
    // failing batches → every URL keeps worst-priority → lexicographic order
    val broken = new BatchedScorer(2, _ => throw new RuntimeException("llm down"))
    val fb = Relevance.prioritize(cands, broken)
      .orderBy("priority").select("urlNorm").as[String].collect().toSeq
    assert(fb == cands.select("urlNorm").as[String].collect().sorted.toSeq)
    // hallucinated extra URLs are semi-joined away (J3)
    val halluc = new RelevanceScorer {
      override def score(urls: org.apache.spark.sql.DataFrame) =
        urls.sparkSession.createDataFrame(Seq(
          ("https://a.test/z", 1.0), ("https://evil.test/not-candidate", 0.0)))
          .toDF("urlNorm", "score")
    }
    val hz = Relevance.prioritize(cands, halluc)
    assert(hz.where($"urlNorm" === "https://evil.test/not-candidate").count() == 0)
    assert(hz.count() == 4)
  }

  test("F10 preflight: scorer/fetcher contract violations fail fast") {
    Preflight.validate(spark, new graft.sources.FixtureFetcher(
      Seq(("https://a.test/x", "a.test", 200, "text/html", "b", Seq.empty[String],
        Seq.empty[String], Seq.empty[String], "http_fast", 1L))
        .toDF("url", "host", "status", "contentType", "content", "links",
          "navLinks", "imageRefs", "fetchMethod", "loadMs")), IdentityScorer)
    val badScorer = new RelevanceScorer {
      override def score(urls: org.apache.spark.sql.DataFrame) =
        urls.select($"urlNorm".as("wrong_name"))
    }
    intercept[IllegalArgumentException] {
      Preflight.validate(spark, new graft.sources.HttpFetcher(), badScorer)
    }
  }

  test("speculation audit: warn-and-proceed contract (VERDICT r5 ask #7)") {
    // spark.speculation is STATIC — a live session (and the engine)
    // cannot modify it, which is exactly why the contract is a warning,
    // not a config change. Both branches of the check:
    val on = new org.apache.spark.SparkConf().set("spark.speculation", "true")
    assert(Preflight.speculationWarning(on).exists(_.contains("politeness")))
    assert(Preflight.speculationWarning(new org.apache.spark.SparkConf()).isEmpty)
    // and validate still completes (warn, never throw) on the live session
    Preflight.validate(spark, new graft.sources.FixtureFetcher(
      Seq(("https://a.test/x", "a.test", 200, "text/html", "b",
        Seq.empty[String], Seq.empty[String], Seq.empty[String],
        "http_fast", 1L))
        .toDF("url", "host", "status", "contentType", "content", "links",
          "navLinks", "imageRefs", "fetchMethod", "loadMs")), IdentityScorer)
  }

  test("decoder registry: dispatch, round-trip, stub plumbing") {
    val png = DecoderRegistry.get("png"); val jpg = DecoderRegistry.get("jpeg")
    assert(png.lossless && !jpg.lossless)
    val r = graft.fixtures.FixtureGen.imageRow(10)
    val img = DecoderRegistry.get(r.fmt).decode(r.bytes)
    assert(img.getWidth == r.w && img.getHeight == r.h)
    assert(png.valid(999.0) && !png.valid(55.0))
    assert(jpg.valid(45.0) && !jpg.valid(39.0))
    assert(DecoderRegistry.supported.contains("video"))
    assert(DecoderRegistry.supported.contains("gif")) // real since q41
    assert(DecoderRegistry.supported.contains("webp")) // real since q48
    intercept[IllegalArgumentException](DecoderRegistry.get("tiff"))
  }

  test("streaming: watermarked hourly window agg matches batch (q08 shape)") {
    // file-stream sources need a directory; stage the single-file table
    val evDir = java.nio.file.Files.createTempDirectory("graft-events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(evDir, "events.parquet"))
    val q = EventsStreaming.hourlyCounts(spark, evDir, "stream_hourly")
    q.awaitTermination(60000)
    // read the upsert sink (Update mode needs a keyed sink: the memory
    // sink appends one row per update, duplicating multi-batch windows)
    val streamed = EventsStreaming.hourlyResult(spark, "stream_hourly")
    val batch = SparkEntry.queries("q08_events_hourly")(spark, "/root/testdata/sf0.001")
      .withColumn("hour", $"hour".cast("timestamp"))
    val a = streamed.select("hour", "event_type", "n", "value_c")
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    val b = batch.select("hour", "event_type", "n", "value_c")
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("streaming: windows updated across MULTIPLE micro-batches stay exact (upsert sink)") {
    // Split the events by TIME into two files so the boundary hour is
    // updated in two different micro-batches (maxFilesPerTrigger=1). The
    // time split keeps every batch-2 row inside the batch-1 watermark;
    // the boundary window's second update is the case an append-only
    // memory sink double-reports and the upsert sink must overwrite.
    val evDir = java.nio.file.Files.createTempDirectory("graft-events-mb").toString
    // pinned NTZ read so the rewritten files carry the same parquet type
    // the streaming schema declares (an inferred-LTZ write would flip the
    // column's isAdjustedToUTC and shift every window)
    val events = spark.read.schema(EventsStreaming.eventSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val micros = graft.functions.TimeFns.ntzEpochMicros($"ts")
    val mid = events.select(percentile_approx(micros, lit(0.5), lit(1000)))
      .as[Long].head()
    val older = events.where(micros <= mid)
    val newer = events.where(micros > mid)
    assert(older.count() > 0 && newer.count() > 0)
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, mtimeMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ev-part").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      val dst = java.nio.file.Paths.get(evDir, name)
      java.nio.file.Files.copy(part, dst)
      // FileStreamSource orders by modification time — pin it so the
      // older half is batch 1 (a newer-first order would watermark-drop
      // the older half and test nothing)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    val base = System.currentTimeMillis() - 60000
    writeOne(older, "part1.parquet", base)
    writeOne(newer, "part2.parquet", base + 10000)
    val q = EventsStreaming.hourlyCounts(spark, evDir, "stream_hourly_mb",
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(60000)
    val streamed = EventsStreaming.hourlyResult(spark, "stream_hourly_mb")
    val batch = SparkEntry.queries("q08_events_hourly")(spark, "/root/testdata/sf0.001")
      .withColumn("hour", $"hour".cast("timestamp"))
    val a = streamed.as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    val b = batch.select("hour", "event_type", "n", "value_c")
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    assert(a == b, "multi-batch window updates must converge to the batch result")
  }

  test("politeness throttle: quiet-host drain — timeout transitions empty the deferred tail") {
    import EventsStreaming.{advanceBudget, FrontierReq, HostBudgetState}
    // 5 requests arrive at once, budget 2: the data batch admits 2 and
    // defers 3; two ProcessingTimeTimeout firings (no new input) must
    // drain the rest in (priority, urlNorm) order with a continuous
    // admittedSeq — the round-2 hazard was a tail stranded forever on a
    // host that stopped receiving input (GroupStateTimeout.NoTimeout)
    val reqs = (1 to 5).map(i => FrontierReq("h.test", s"https://h.test/$i", i.toLong))
    val (s1, a1) = advanceBudget("h.test", HostBudgetState(0L), reqs, 2)
    assert(a1.map(_.urlNorm) == Seq("https://h.test/1", "https://h.test/2"))
    assert(s1.pending.size == 3)
    val (s2, a2) = advanceBudget("h.test", s1, Seq.empty, 2) // timeout firing
    assert(a2.map(_.urlNorm) == Seq("https://h.test/3", "https://h.test/4"))
    assert(a2.map(_.admittedSeq) == Seq(3L, 4L))
    val (s3, a3) = advanceBudget("h.test", s2, Seq.empty, 2) // timeout firing
    assert(a3.map(_.urlNorm) == Seq("https://h.test/5"))
    assert(a3.map(_.admittedSeq) == Seq(5L))
    assert(s3.pending.isEmpty) // drained — no further timeout armed
  }

  test("streaming: flatMapGroupsWithState politeness throttle + quiet-host timeout drain") {
    // ONE file of 5 h1 requests, budget 2: the single data batch admits 2
    // and defers 3 — the remaining 3 can only surface via the
    // ProcessingTimeTimeout heartbeat (h1 receives no further input), the
    // exact stranded-tail hazard the timeout fixes.
    val flat = java.nio.file.Files.createTempDirectory("graft-throttle").toString
    (Seq("a", "b", "c", "d", "e").zipWithIndex.map { case (u, i) =>
      ("h1.test", s"https://h1.test/$u", (i + 1).toLong)
    } :+ (("h2.test", "https://h2.test/a", 1L)))
      .toDF("host", "urlNorm", "priority").coalesce(1).write.parquet(s"$flat/f1")
    val q = EventsStreaming.throttleQuery(spark, s"$flat/f1", "stream_throttle",
      budgetPerBatch = 2, drainIntervalMs = 200L)
    try {
      def table() = spark.sql(
        "SELECT host, urlNorm, admittedSeq FROM stream_throttle")
        .as[(String, String, Long)].collect().toSet
      val deadline = System.currentTimeMillis() + 60000
      while (table().count(_._1 == "h1.test") < 5 &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
      val got = table()
      val h1 = got.filter(_._1 == "h1.test")
      assert(h1.map(_._2) ==
        Set("a", "b", "c", "d", "e").map(u => s"https://h1.test/$u"),
        s"deferred requests lost (quiet-host tail stranded): $h1")
      // cumulative sequence across data batch + timeout drains, in
      // (priority, urlNorm) order
      assert(h1.toSeq.sortBy(_._3).map(_._2) ==
        Seq("a", "b", "c", "d", "e").map(u => s"https://h1.test/$u"))
      assert(got.exists(_._1 == "h2.test"))
    } finally q.stop()
  }
}
