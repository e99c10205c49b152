package graft

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.functions.{col, udf}

import graft.fixtures.FixtureGen
import graft.functions.Warc

/** X1/S10 — WARC (ISO 28500) archive read/write: record grammar with
  * folded fields, per-record gzip members split + CRC-verified by a raw
  * member walk, HTTP response blocks, sha1/base32 payload-digest
  * verification, and the two distributed operators (record explode +
  * per-partition archival sink). Hostile inputs classify. */
class WarcSpec extends SparkSpec {

  private def threeRecords(version: String) = {
    val payload = "hello archive".getBytes(US_ASCII)
    Vector(
      (Warc.RecordSpec("warcinfo", None,
        "software: graft\r\n".getBytes(US_ASCII), "application/warc-fields"),
        "urn:uuid:r0", "2026-08-19T00:00:00Z"),
      (Warc.RecordSpec("request", Some("https://h.test/a"),
        Warc.httpRequestBlock("/a", "h.test"),
        "application/http;msgtype=request"),
        "urn:uuid:r1", "2026-08-19T00:00:01Z"),
      (Warc.RecordSpec("response", Some("https://h.test/a"),
        Warc.httpResponseBlock(200, "text/html", payload),
        "application/http;msgtype=response",
        Vector("WARC-Payload-Digest" -> Warc.sha1Digest(payload))),
        "urn:uuid:r2", "2026-08-19T00:00:02Z"))
  }

  test("plain round-trip: grammar fields, 1.0 <>-wrapped URI unwraps, http block parses") {
    for (v <- Seq("1.0", "1.1")) {
      val bytes = Warc.encode(v, threeRecords(v), gzipPerRecord = false)
      val recs = Warc.parseAll(bytes).get
      assert(recs.map(_.warcType) == Vector("warcinfo", "request", "response"))
      assert(recs.forall(_.version == v))
      // the 1.0 writer wraps Target-URI in <>; the reader must unwrap BOTH forms
      assert(recs(2).targetUri == "https://h.test/a", v)
      val msg = Warc.httpResponse(recs(2).block).get
      assert(msg.status == 200 &&
        msg.header("Content-Type").contains("text/html") &&
        new String(msg.body, US_ASCII) == "hello archive")
    }
  }

  test("gzip layout: one member per record, CRC-verified, boundaries a GZIPInputStream cannot show") {
    val bytes = Warc.encode("1.1", threeRecords("1.1"), gzipPerRecord = true)
    val sizes = Warc.gzipMemberSizes(bytes).get
    assert(sizes.length == 3, "spec-compliant seekable layout = 3 members")
    assert(sizes.sum == bytes.length)
    assert(Warc.parseAll(bytes).get.size == 3)
    // corrupting one member's trailer CRC fails the member walk
    val bad = bytes.clone()
    bad(sizes(0) - 6) = (bad(sizes(0) - 6) ^ 0xff).toByte
    assert(Warc.gzipMemberSizes(bad).isEmpty)
  }

  test("payload digest: verified not just parsed — a flipped base32 char fails") {
    val good = Warc.encode("1.1", threeRecords("1.1"), gzipPerRecord = false)
    assert(Warc.archiveMeta(good).get.digestOk)
    val recs = threeRecords("1.1")
    val tampered = recs.updated(2, {
      val (spec, id, date) = recs(2)
      val d = spec.extraHeaders.head._2
      val flipped = "sha1:" + (if (d(5) == 'A') 'B' else 'A') + d.substring(6)
      (spec.copy(extraHeaders = Vector("WARC-Payload-Digest" -> flipped)), id, date)
    })
    val bad = Warc.encode("1.1", tampered, gzipPerRecord = false)
    val m = Warc.archiveMeta(bad).get
    assert(!m.digestOk && m.nRecords == 3, "values parse; the digest check fails")
  }

  test("header continuation folding (RFC 5322 SP/HT lines) joins values") {
    val rec = "WARC/1.1\r\n" +
      "WARC-Type: metadata\r\n" +
      "WARC-Record-ID: <urn:uuid:f>\r\n" +
      "WARC-Date: 2026-08-19T00:00:00Z\r\n" +
      "WARC-Target-URI: https://h.test/\r\n" +
      "X-Long: first part\r\n\tsecond part\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n"
    val recs = Warc.parseAll(rec.getBytes(UTF_8)).get
    assert(recs.head.header("X-Long").contains("first part second part"))
    assert(new String(recs.head.block, US_ASCII) == "ok")
  }

  test("hostile inputs classify: truncation, lying lengths, bad grammar, bombs") {
    val good = Warc.encode("1.1", threeRecords("1.1"), gzipPerRecord = false)
    assert(Warc.parseAll(null).isEmpty)
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    assert(Warc.parseAll("HTTP/1.1 200 OK\r\n\r\n".getBytes(US_ASCII)).isEmpty)
    // truncated mid-block
    assert(Warc.parseAll(good.take(good.length / 2)).isEmpty)
    // Content-Length pointing past the end of the archive
    val lying = new String(good, UTF_8)
      .replaceFirst("Content-Length: 17", "Content-Length: 999999")
    assert(Warc.parseAll(lying.getBytes(UTF_8)).isEmpty)
    // negative length
    val neg = new String(good, UTF_8)
      .replaceFirst("Content-Length: 17", "Content-Length: -1")
    assert(Warc.parseAll(neg.getBytes(UTF_8)).isEmpty)
    // missing version line
    assert(Warc.parseAll("NOTWARC/1.1\r\n\r\n".getBytes(US_ASCII)).isEmpty)
    // gzip stream that is not a valid member sequence
    val gz = Warc.encode("1.1", threeRecords("1.1"), gzipPerRecord = true)
    assert(Warc.parseAll(gz.take(20)).isEmpty)
  }

  test("fixture closed forms: every oracle column, docIds 0..120") {
    for (d <- 0L to 120L) {
      val m = Warc.archiveMeta(FixtureGen.warcBytes(d)).get
      assert(m.version == (if (d % 2 == 0) "1.1" else "1.0"), s"d=$d")
      assert(m.gzipped == (d % 3 == 0), s"d=$d")
      assert(m.nRecords == 3 + (if (d % 5 == 0) 1 else 0) +
        (if (d % 7 == 0) 1 else 0), s"d=$d")
      assert(m.nResponses == 1, s"d=$d")
      assert(m.httpStatus == (if (d % 13 == 0) 404 else 200), s"d=$d")
      assert(m.contentType == Seq("text/html", "image/png",
        "application/json", "text/plain")((d % 4).toInt), s"d=$d")
      assert(m.payloadLen == 10 + d % 90, s"d=$d")
      assert(m.digestOk == (d % 17 != 0), s"d=$d")
      assert(m.hasRevisit == (d % 7 == 0), s"d=$d")
    }
  }

  test("records operator: typed explode, corrupt quarantine row, NO Exchange") {
    val mk = udf((i: Long) => FixtureGen.warcBytes(i))
    import spark.implicits._
    val good = spark.range(4).toDF("i")
      .select(col("i").cast("string").as("archive_id"), mk(col("i")).as("bytes"))
    val corrupt = Seq(("bad", "not a warc".getBytes(UTF_8)))
      .toDF("archive_id", "bytes")
    val out = graft.operators.Archive.records(good.unionAll(corrupt))
    val planned = out.queryExecution.executedPlan.toString
    assert(!planned.contains("Exchange"), planned)
    val rows = out.collect()
    val byArchive = rows.groupBy(_.getString(0))
    // doc 0: warcinfo+request+response+metadata(d%5)+revisit(d%7) = 5
    assert(byArchive("0").length == 5 && byArchive("1").length == 3)
    // doc 0 is BY DESIGN the hostile corner: 404 (d%13) + corrupt digest (d%17)
    val resp0 = byArchive("0").find(_.getString(2) == "response").get
    assert(resp0.getInt(4) == 404 && !resp0.getBoolean(7))
    val resp1 = byArchive("1").find(_.getString(2) == "response").get
    assert(resp1.getInt(4) == 200 && resp1.getString(5) == "image/png" &&
      resp1.getLong(6) == 11 && resp1.getBoolean(7))
    val q = byArchive("bad")
    assert(q.length == 1 && q.head.getInt(1) == -1 &&
      q.head.getString(2) == "corrupt")
  }

  test("sink operator: per-partition .warc.gz, member-per-record, reads back") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("warc-sink").toString
    val pages = (0 until 10).map { i =>
      (s"https://h${i % 2}.test/p/$i", 200, "text/html",
        s"body-$i".getBytes(UTF_8), "2026-08-19T00:00:00Z")
    }.toDF("url", "status", "content_type", "body", "fetched_at")
      .repartition(2)
    val manifest = graft.operators.Archive.sink(pages, dir).collect()
    assert(manifest.length == 2 && manifest.map(_.getLong(1)).sum == 10)
    // every written file: spec-layout members, and the records round-trip
    val back = manifest.flatMap { m =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(m.getString(0)))
      assert(Warc.gzipMemberSizes(bytes).get.length == m.getLong(1),
        "one gzip member per record")
      Warc.parseAll(bytes).get
    }
    assert(back.length == 10 && back.forall(_.warcType == "response"))
    assert(back.map(_.targetUri).toSet ==
      (0 until 10).map(i => s"https://h${i % 2}.test/p/$i").toSet)
    // digests written by the sink verify on read
    back.foreach { r =>
      val msg = Warc.httpResponse(r.block).get
      assert(r.header("WARC-Payload-Digest").contains(Warc.sha1Digest(msg.body)))
    }
  }

  test("sink streaming rework: byte-identical to the buffered encoder, " +
      "commits via temp+rename, re-run overwrite-safe") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("warc-sink-stream").toString
    val pages = (0 until 7).map { i =>
      (s"https://s.test/p/$i", 200, "text/html",
        s"payload-$i".getBytes(UTF_8), "2026-08-19T00:00:00Z")
    }.toDF("url", "status", "content_type", "body", "fetched_at")
      .repartition(1)
    val m1 = graft.operators.Archive.sink(pages, dir).collect()
    assert(m1.length == 1)
    val file = java.nio.file.Paths.get(m1.head.getString(0))
    val streamed = java.nio.file.Files.readAllBytes(file)
    // identity witness: the whole-partition buffered encoder over the SAME
    // records produces the SAME bytes (the streaming rework is a memory
    // shape change, not a format change)
    val recs = (0 until 7).map { i =>
      val url = s"https://s.test/p/$i"
      val payload = s"payload-$i".getBytes(UTF_8)
      (Warc.RecordSpec("response", Some(url),
        Warc.httpResponseBlock(200, "text/html", payload),
        "application/http;msgtype=response",
        Vector("WARC-Payload-Digest" -> Warc.sha1Digest(payload))),
        "urn:graft:sha1:" + Warc.sha1Digest(url.getBytes(UTF_8)).substring(5),
        "2026-08-19T00:00:00Z")
    }.toVector
    assert(streamed.toSeq == Warc.encode("1.1", recs, gzipPerRecord = true).toSeq)
    assert(m1.head.getLong(2) == streamed.length, "manifest n_bytes = file size")
    // the final name appeared via rename: no partial/torn file can be
    // observed under it, and a second (retried/speculative-style) run
    // committing onto the existing file succeeds with identical bytes
    val m2 = graft.operators.Archive.sink(pages, dir).collect()
    assert(m2.head.getString(0) == m1.head.getString(0))
    assert(java.nio.file.Files.readAllBytes(file).toSeq == streamed.toSeq)
    // temp area holds no leftover attempt files
    val tmpDir = java.nio.file.Paths.get(dir, "_temporary")
    if (java.nio.file.Files.exists(tmpDir)) {
      val leftovers = java.nio.file.Files.list(tmpDir)
      try assert(!leftovers.findAny().isPresent, "no orphan attempt files")
      finally leftovers.close()
    }
  }

  test("cdx: offsets replay — seek, slice, re-parse, same record — plain AND gzipped") {
    for (gz <- Seq(false, true)) {
      val bytes = Warc.encode("1.1", threeRecords("1.1"), gzipPerRecord = gz)
      val withOff = Warc.recordsWithOffsets(bytes).get
      assert(withOff.size == 3)
      assert(withOff.map(_._2) == withOff.map(_._2).sorted, "offsets in file order")
      withOff.foreach { case (rec, off, len) =>
        assert(off >= 0 && len > 0 && off + len <= bytes.length)
        val slice = java.util.Arrays.copyOfRange(
          bytes, off.toInt, (off + len).toInt)
        val replayed = Warc.parseAll(slice).get
        assert(replayed.size == 1, "member-per-record layout replays one record")
        assert(replayed.head.warcType == rec.warcType &&
          replayed.head.targetUri == rec.targetUri, s"gz=$gz")
      }
      // lines: only the response indexes; key + ts are the CDX forms
      val lines = Warc.cdxLines("f.warc", bytes).get
      assert(lines.size == 1)
      val l = lines.head
      assert(l.surtKey == "test,h)/a")
      assert(l.ts == "20260819000002")
      assert(l.status == 200 && l.mime == "text/html" && l.filename == "f.warc")
      assert(l.digest == Warc.sha1Digest("hello archive".getBytes(US_ASCII)))
      // CDXJ serialization is the pywb/OpenWayback line shape
      assert(l.toCdxj.startsWith("test,h)/a 20260819000002 {\"url\": "))
      assert(l.toCdxj.contains(s""""offset": "${l.offset}""""))
    }
  }

  test("wet: conversion records round-trip arbitrary text, byte-exact, gz and plain") {
    val texts = Vector(
      "plain ascii",
      "embedded\r\n\r\nterminator lookalikes\nand bare LFs",
      "unicode: café 日本語 😀", // incl. non-BMP
      "", // empty text is a legal conversion record
      "x" * 10000)
    for (gz <- Seq(false, true)) {
      val recs = texts.zipWithIndex.map { case (t, i) =>
        (Warc.RecordSpec("conversion", Some(s"https://w.test/$i"),
          t.getBytes(UTF_8), "text/plain"),
          s"urn:uuid:c$i", "2026-08-19T00:00:00Z")
      }
      val bytes = Warc.encode("1.1", recs, gzipPerRecord = gz)
      val back = Warc.wetTexts(bytes).get
      assert(back.map(_._2) == texts, s"gz=$gz")
      assert(back.map(_._1) == texts.indices.map(i => s"https://w.test/$i"))
    }
    // response records are NOT text: they never leak into the WET view
    val mixed = Warc.encode("1.1", threeRecords("1.1"), gzipPerRecord = false)
    assert(Warc.wetTexts(mixed).get.isEmpty)
  }

  test("wet operator: distributed text extraction, corrupt quarantine") {
    import spark.implicits._
    val good = Warc.encode("1.1", Vector(
      (Warc.RecordSpec("conversion", Some("https://w.test/a"),
        "hello corpus".getBytes(UTF_8), "text/plain"),
        "urn:uuid:c0", "2026-08-19T00:00:00Z")), gzipPerRecord = true)
    val df = Seq(("w1.warc.wet.gz", good), ("bad", Array[Byte](9, 9)))
      .toDF("archive_id", "bytes")
    val rows = graft.operators.Archive.wet(df).collect()
    assert(rows.length == 2)
    assert(rows.exists(r => r.getString(1) == "https://w.test/a" &&
      r.getString(2) == "hello corpus"))
    assert(rows.exists(r => r.getString(1) == "corrupt" && r.isNullAt(2)))
  }

  test("fromFetched: the engine's image table archives as replayable WARC + CDX") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("warc-fetched").toString
    val fetched = Seq(
      ("img-1", Array[Byte](1, 2, 3), "png", "https://h.test/page"),
      ("img-2", Array[Byte](4, 5), "jpg", "https://h.test/page"),
      ("img-3", Array[Byte](6), "png", "https://h.test/other?x=1"))
      .toDF("image_id", "bytes", "fmt", "url").repartition(1)
    val manifest = graft.operators.Archive.fromFetched(
      fetched, dir, "2026-08-19T00:00:00Z").collect()
    assert(manifest.map(_.getLong(1)).sum == 3)
    val archives = manifest.toSeq.map(m => (m.getString(0),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(m.getString(0)))))
      .toDF("archive_id", "bytes")
    val idx = graft.operators.Archive.cdx(archives)
      .orderBy("surt_key").collect()
    assert(idx.length == 3)
    // page-URL-plus-query keys: unique per image, SURT-sorted by page
    assert(idx.map(_.getString(0)).toSet == Set(
      "test,h)/page?graft_image=img-1",
      "test,h)/page?graft_image=img-2",
      "test,h)/other?graft_image=img-3&x=1"))
    assert(idx.forall(_.getString(3) == "image/png") == false) // jpg present too
    // and the records replay with their payload bytes intact
    val back = graft.operators.Archive.records(archives).collect()
    assert(back.length == 3 && back.forall(_.getBoolean(7)), "digests verify")
  }

  test("cdx operator: distributed index rows, sorted output is the archive index") {
    import spark.implicits._
    val good = Warc.encode("1.1", threeRecords("1.1"), gzipPerRecord = true)
    val df = Seq(("a1.warc.gz", good), ("bad", Array[Byte](1, 2, 3)))
      .toDF("archive_id", "bytes")
    val idx = graft.operators.Archive.cdx(df)
    val rows = idx.orderBy("surt_key", "ts").collect()
    assert(rows.length == 2)
    assert(rows.exists(r => r.getString(0) == "corrupt" && r.getInt(4) == -1),
      "malformed archive quarantines as a row, never a silent drop")
    val ok = rows.find(_.getString(0) == "test,h)/a").get
    assert(ok.getString(8) == "a1.warc.gz" && ok.getLong(6) >= 0)
    // narrow plan: indexing shuffles nothing
    assert(!idx.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
