package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pdf

/** X1 — PDF document metadata: the real xref machinery in all wire
  * forms (classic tables, incremental /Prev chains with newest-entry-
  * wins, cross-reference streams with FlateDecode + PNG predictors,
  * compressed-object streams with indirect /Length), page count from
  * the root Pages /Count, the encryption flag, and the has_js /
  * has_attachments scrub signals. Malformed payloads classify. */
class PdfSpec extends AnyFunSuite {

  private def spec(form: String, predictor: Boolean = false) = Pdf.EncodeSpec(
    versionMinor = 6, nPages = 4, encrypted = false, jsOpenAction = false,
    jsNames = false, attachments = false, form = form, predictor = predictor)

  test("classic xref table: version, page count, clean scrub signals") {
    val m = Pdf.docMeta(Pdf.encode(spec("table"))).get
    assert(m == Pdf.Meta("1.6", 4, encrypted = false, hasJs = false,
      hasAttachments = false, xrefKind = "table", incremental = false))
  }

  test("incremental update: /Prev chain followed, newest catalog wins (JS flips on)") {
    val m = Pdf.docMeta(Pdf.encode(spec("incremental"))).get
    assert(m.xrefKind == "table" && m.incremental && m.hasJs,
      "the update replaces the catalog with an OpenAction-JS one; " +
        "a walker that reads the OLD entry misses it")
    assert(m.nPages == 4)
  }

  test("xref stream: raw flate and PNG Up predictor both decode") {
    for (pred <- Seq(false, true)) {
      val m = Pdf.docMeta(Pdf.encode(spec("stream", pred))).get
      assert(m.xrefKind == "stream" && !m.incremental && m.nPages == 4, s"pred=$pred")
    }
  }

  test("object streams: catalog+pages resolved through type-2 entries and an indirect /Length") {
    for (pred <- Seq(false, true)) {
      val m = Pdf.docMeta(Pdf.encode(spec("objstm", pred))).get
      assert(m.xrefKind == "stream" && m.nPages == 4, s"pred=$pred")
    }
  }

  test("scrub signals and encryption are independent and additive") {
    val m = Pdf.docMeta(Pdf.encode(Pdf.EncodeSpec(5, 2, encrypted = true,
      jsOpenAction = true, jsNames = true, attachments = true,
      form = "table", predictor = false))).get
    assert(m == Pdf.Meta("1.5", 2, encrypted = true, hasJs = true,
      hasAttachments = true, xrefKind = "table", incremental = false))
    // names-tree JS alone (no OpenAction)
    val names = Pdf.docMeta(Pdf.encode(Pdf.EncodeSpec(7, 1, encrypted = false,
      jsOpenAction = false, jsNames = true, attachments = false,
      form = "stream", predictor = true))).get
    assert(names.hasJs && !names.hasAttachments && !names.encrypted)
  }

  test("truncated deflate stream rejects at the filter layer (ADVICE r5)") {
    // a valid-prefix-but-cut deflate stream makes Inflater exit on
    // needsInput without finishing; the old code returned the PARTIAL
    // inflate output, letting a truncated xref/ObjStm parse to
    // plausible-but-wrong entries — it must classify Malformed instead
    val payload = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    // intact stream inflates fully
    assert(Pdf.inflateBounded(deflated).toSeq == payload.toSeq)
    // truncated stream throws (Malformed is a RuntimeException singleton)
    intercept[RuntimeException] {
      Pdf.inflateBounded(deflated.take(deflated.length / 2))
    }
  }

  test("hand-built minimal PDF parses; junk prefix within 1 KiB tolerated") {
    // hand-written, not via the encoder — pins the parser against an
    // independently constructed file (multi-subsection xref, comments)
    val body = new StringBuilder()
    body.append("%junk bytes before the header\n")
    val hdrAt = body.length
    body.append("%PDF-1.4\n")
    val o1 = body.length
    body.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val o2 = body.length
    body.append("2 0 obj\n% a comment inside an object\n" +
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    val o3 = body.length
    body.append("3 0 obj << /Type /Page /Parent 2 0 R >> endobj\n")
    val x = body.length
    body.append("xref\n0 1\n0000000000 65535 f \n")
    body.append(f"1 2\n$o1%010d 00000 n \n$o2%010d 00000 n \n")
    body.append(f"3 1\n$o3%010d 00000 n \n")
    body.append(s"trailer << /Size 4 /Root 1 0 R >>\nstartxref\n$x\n%%EOF")
    val m = Pdf.docMeta(body.toString.getBytes("ISO-8859-1")).get
    assert(m == Pdf.Meta("1.4", 1, encrypted = false, hasJs = false,
      hasAttachments = false, xrefKind = "table", incremental = false))
    assert(hdrAt > 0) // the header really was offset
  }

  test("fixture closed form holds for the q60 oracle") {
    for (d <- 0L until 240L) {
      val m = Pdf.docMeta(graft.fixtures.FixtureGen.pdfBytes(d)).get
      assert(m.version == s"1.${4 + d % 4}", s"d=$d")
      assert(m.nPages == 1 + d % 9, s"d=$d")
      assert(m.encrypted == (d % 5 == 0), s"d=$d")
      assert(m.hasJs == (d % 7 == 0 || d % 11 == 0 || d % 3 == 2), s"d=$d")
      assert(m.hasAttachments == (d % 13 == 0), s"d=$d")
      assert(m.xrefKind == (if (d % 3 == 0) "stream" else "table"), s"d=$d")
      assert(m.incremental == (d % 3 == 2), s"d=$d")
    }
  }

  test("hostile inputs classify, never throw or overrun") {
    assert(Pdf.docMeta(null).isEmpty)
    assert(Pdf.docMeta(Array.emptyByteArray).isEmpty)
    assert(Pdf.docMeta("%PDF-1.4 but nothing else".getBytes).isEmpty)
    // startxref pointing at itself (offset cycle)
    val selfRef = "%PDF-1.4\nxref\n0 0\ntrailer << /Size 0 /Prev 9 >>\nstartxref\n9\n%%EOF"
    assert(Pdf.docMeta(selfRef.getBytes).isEmpty)
    // a sea of objects cannot spin past the token budget
    val bomb = "%PDF-1.4\n" + ("1 0 obj null endobj\n" * 20000) +
      "startxref\n9\n%%EOF"
    assert(Pdf.docMeta(bomb.getBytes).isEmpty)
    // truncation sweep over every form
    for (form <- Seq("table", "incremental", "stream", "objstm")) {
      val full = Pdf.encode(spec(form, predictor = form == "objstm"))
      var cut = 1
      while (cut < full.length) {
        Pdf.docMeta(full.take(cut)) // any outcome but a throw
        cut += 11
      }
    }
  }
}
