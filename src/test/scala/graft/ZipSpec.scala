package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.FixtureGen
import graft.functions.Zip

/** X1 — ZIP central-directory walk + DOCX metadata: STORED and DEFLATE
  * with per-entry CRC32, ZIP64 (EOCD64 + locator + 0x0001 extras),
  * central-over-local size trust, WordprocessingML counts, the
  * macros/external-ref scrub signals, hardened-XML posture. Hostile
  * inputs classify. */
class ZipSpec extends AnyFunSuite {

  private val items = Vector(
    ("a.txt", "alpha beta".getBytes(UTF_8), 0),
    ("dir/b.bin", Array.tabulate(3000)(i => (i * 31).toByte), 8),
    ("empty", Array.emptyByteArray, 8))

  test("round-trip: stored + deflate entries, names, sizes, CRC-verified reads") {
    val zip = Zip.encode(items)
    val es = Zip.entries(zip).get
    assert(es.map(_.name) == items.map(_._1))
    items.foreach { case (name, data, method) =>
      val e = es.find(_.name == name).get
      assert(e.method == method && e.uncompSize == data.length)
      assert(Zip.read(zip, e).get.sameElements(data), name)
    }
  }

  test("zip64: EOCD64 + locator + saturated central fields resolve via 0x0001 extras") {
    val zip = Zip.encode(items, forceZip64 = true)
    val es = Zip.entries(zip).get
    assert(es.map(_.name) == items.map(_._1))
    items.foreach { case (name, data, _) =>
      assert(Zip.read(zip, es.find(_.name == name).get).get.sameElements(data))
    }
    // the plain walk of the same items must agree entry-for-entry
    val plain = Zip.entries(Zip.encode(items)).get
    assert(es.map(e => (e.name, e.method, e.uncompSize, e.crc)) ==
      plain.map(e => (e.name, e.method, e.uncompSize, e.crc)))
  }

  test("a tampered byte fails the entry CRC — reads classify, not return garbage") {
    val zip = Zip.encode(items)
    val es = Zip.entries(zip).get
    val b = es.find(_.name == "dir/b.bin").get
    val bad = zip.clone()
    // flip a byte inside b's deflate stream (local header is 30+name)
    val dataAt = b.localOffset.toInt + 30 + "dir/b.bin".length + 5
    bad(dataAt) = (bad(dataAt) ^ 0x55).toByte
    assert(Zip.read(bad, b).isEmpty)
    // untouched sibling still reads
    assert(Zip.read(bad, es.find(_.name == "a.txt").get).isDefined)
  }

  test("zip64: a SHORT 0x0001 extra record rejects instead of reading " +
      "neighbor records' bytes (ADVICE r5)") {
    val zip = Zip.encode(items, forceZip64 = true)
    // find a central-directory 0x0001 extra record and shrink its declared
    // size below what the saturated fields need: the walk must classify,
    // not source sizes/offsets from whatever bytes follow the record
    val sigAt = {
      var p = -1
      var i = 0
      while (p < 0 && i + 4 <= zip.length) {
        if ((zip(i) & 0xff) == 0x50 && (zip(i + 1) & 0xff) == 0x4b &&
            (zip(i + 2) & 0xff) == 0x01 && (zip(i + 3) & 0xff) == 0x02) p = i
        i += 1
      }
      p
    }
    assert(sigAt >= 0, "central directory present")
    val nameLen = ((zip(sigAt + 28) & 0xff) | ((zip(sigAt + 29) & 0xff) << 8))
    val extraAt = sigAt + 46 + nameLen
    assert((zip(extraAt) & 0xff) == 0x01 && (zip(extraAt + 1) & 0xff) == 0x00,
      "zip64 0x0001 record leads the extra region")
    val bad = zip.clone()
    bad(extraAt + 2) = 4; bad(extraAt + 3) = 0 // declared size 4 < needed
    assert(Zip.entries(bad).isEmpty)
  }

  test("hostile inputs classify: truncation, no EOCD, lying counts/offsets") {
    val zip = Zip.encode(items)
    assert(Zip.entries(null).isEmpty)
    assert(Zip.entries(Array.emptyByteArray).isEmpty)
    assert(Zip.entries("PK\u0003\u0004 not really".getBytes(UTF_8)).isEmpty)
    assert(Zip.entries(zip.take(zip.length - 3)).isEmpty) // EOCD torn
    // EOCD pointing its central-directory offset into nowhere
    val bad = zip.clone()
    val eocd = bad.length - 22
    bad(eocd + 16) = 0x7f.toByte; bad(eocd + 17) = 0x7f.toByte
    assert(Zip.entries(bad).isEmpty)
  }

  test("docx: counts, properties, scrub signals, stored and deflated document.xml") {
    val m = Zip.docxMeta(Zip.encodeDocx(Zip.DocxSpec(
      nParagraphs = 3, wordsPerPara = 4, title = "T", creator = "C",
      macros = true, externalRef = true, storedDocument = false,
      zip64 = false))).get
    assert(m.nParagraphs == 3 && m.nWords == 12)
    assert(m.title == "T" && m.creator == "C")
    assert(m.hasMacros && m.hasExternalRef && !m.zip64)
    assert(m.docMethod == "deflate" && m.nEntries == 7)
    val stored = Zip.docxMeta(Zip.encodeDocx(Zip.DocxSpec(
      1, 2, "t", "c", macros = false, externalRef = false,
      storedDocument = true, zip64 = true))).get
    assert(stored.docMethod == "stored" && !stored.hasMacros &&
      !stored.hasExternalRef && stored.zip64 && stored.nEntries == 6)
  }

  test("docx hardening: an ENTITY-carrying document.xml classifies (no XXE)") {
    val evil =
      """<?xml version="1.0"?><!DOCTYPE d [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body><w:p><w:r><w:t>&x;</w:t></w:r></w:p></w:body></w:document>""".stripMargin
    val zip = Zip.encode(Vector(
      ("[Content_Types].xml", "<Types/>".getBytes(UTF_8), 8),
      ("word/document.xml", evil.getBytes(UTF_8), 8)))
    assert(Zip.docxMeta(zip).isEmpty)
    // a zip that simply is not a docx also classifies
    assert(Zip.docxMeta(Zip.encode(items)).isEmpty)
  }

  test("fixture closed forms: every oracle column, docIds 0..120") {
    for (d <- 0L to 120L) {
      val m = Zip.docxMeta(FixtureGen.docxBytes(d)).get
      assert(m.nEntries == 6 + (if (d % 11 == 0) 1 else 0), s"d=$d")
      assert(m.nParagraphs == 1 + d % 6, s"d=$d")
      assert(m.nWords == (1 + d % 6) * (2 + d % 5), s"d=$d")
      assert(m.title == s"Doc $d" && m.creator == s"author-${d % 9}", s"d=$d")
      assert(m.hasMacros == (d % 11 == 0), s"d=$d")
      assert(m.hasExternalRef == (d % 7 == 0), s"d=$d")
      assert(m.docMethod == (if (d % 2 == 0) "stored" else "deflate"), s"d=$d")
      assert(m.zip64 == (d % 13 == 0), s"d=$d")
    }
  }
}
