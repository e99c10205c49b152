package graft.functions

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, Inflater}


/** ZIP (PKWARE APPNOTE) central-directory walk + OOXML/DOCX metadata.
  *
  * Office documents are a first-class web payload (every corporate site
  * serves .docx), and they are ZIP archives: the walk here is the real
  * machinery — EOCD scan from the tail through the max-comment window,
  * central directory entries, local-header indirection to the data,
  * STORED and DEFLATE methods (raw `Inflater`), per-entry CRC32
  * verification, and the ZIP64 shapes streamed writers emit even for
  * small files (EOCD64 + locator, and 0xFFFFFFFF central fields resolved
  * through the 0x0001 extra record). Sizes always come from the CENTRAL
  * directory, never the local header — streamed zips leave local sizes
  * zero with a data descriptor, and a walker that trusts them reads
  * garbage.
  *
  * On top of the container, `docxMeta` reads the WordprocessingML parts a
  * training-data pipeline needs before ingesting a document: paragraph and
  * word counts from `word/document.xml` (`w:p`/`w:t`), title/creator from
  * `docProps/core.xml`, and two scrub signals — `has_macros`
  * (`word/vbaProject.bin` present: executable content) and
  * `has_external_ref` (a `TargetMode="External"` relationship: remote
  * template injection / tracking). XML parsing carries the same hardened
  * posture as the sitemap and SVG walkers: entities and doctypes refuse
  * outright, errors are silent and classify.
  *
  * Bounded everywhere (entry count, name length, per-entry and total
  * inflate caps); hostile input classifies as `None`, never throws.
  */
object Zip {

  val MaxEntries = 4096
  val MaxNameLen = 4096
  val MaxEntryBytes: Int = 64 << 20
  val MaxTotalBytes: Long = 256L << 20

  final case class Entry(
      name: String,
      method: Int, // 0 stored, 8 deflate
      compSize: Long,
      uncompSize: Long,
      crc: Long,
      localOffset: Long)

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  /** Walk the central directory. None on any structural lie. */
  def entries(bytes: Array[Byte]): Option[Vector[Entry]] =
    try {
      if (bytes == null || bytes.length < 22) return None
      // EOCD: scan back through the max 64 KiB comment window
      var eocd = -1
      val lo = math.max(0, bytes.length - 22 - 0xffff)
      var p = bytes.length - 22
      while (p >= lo && eocd < 0) {
        if (le32(bytes, p) == 0x06054b50L) eocd = p
        p -= 1
      }
      if (eocd < 0) return None
      var count = le16(bytes, eocd + 10).toLong
      var cdOffset = le32(bytes, eocd + 16)
      // ZIP64: locator sits 20 bytes before EOCD when any EOCD field
      // saturated (streamed writers emit it even for tiny archives)
      val saturated = count == 0xffffL || cdOffset == 0xffffffffL ||
        le32(bytes, eocd + 12) == 0xffffffffL
      if (saturated) {
        val locAt = eocd - 20
        if (locAt < 0 || le32(bytes, locAt) != 0x07064b50L) return None
        val e64 = le64(bytes, locAt + 8)
        if (e64 < 0 || e64 + 56 > bytes.length) return None
        if (le32(bytes, e64.toInt) != 0x06064b50L) return None
        count = le64(bytes, e64.toInt + 32)
        cdOffset = le64(bytes, e64.toInt + 48)
      }
      if (count < 0 || count > MaxEntries) return None
      if (cdOffset < 0 || cdOffset >= bytes.length) return None
      var pos = cdOffset.toInt
      val out = Vector.newBuilder[Entry]
      var i = 0L
      while (i < count) {
        if (pos + 46 > bytes.length || le32(bytes, pos) != 0x02014b50L)
          return None
        val method = le16(bytes, pos + 10)
        val crc = le32(bytes, pos + 16)
        var comp = le32(bytes, pos + 20)
        var uncomp = le32(bytes, pos + 24)
        val nameLen = le16(bytes, pos + 28)
        val extraLen = le16(bytes, pos + 30)
        val commentLen = le16(bytes, pos + 32)
        var off = le32(bytes, pos + 42)
        if (nameLen > MaxNameLen) return None
        if (pos + 46 + nameLen + extraLen + commentLen > bytes.length) return None
        val name = new String(bytes, pos + 46, nameLen, UTF_8)
        // 0x0001 extra: 8-byte values, present ONLY for saturated fields,
        // in APPNOTE's fixed order uncomp, comp, offset
        if (uncomp == 0xffffffffL || comp == 0xffffffffL || off == 0xffffffffL) {
          var ep = pos + 46 + nameLen
          val eEnd = ep + extraLen
          var found = false
          while (ep + 4 <= eEnd && !found) {
            val id = le16(bytes, ep)
            val sz = le16(bytes, ep + 2)
            if (id == 1) {
              // value reads are bounded by THIS record's declared size, not
              // the whole extra region: a short 0x0001 record must reject
              // instead of silently sourcing sizes from adjacent records
              val recEnd = ep + 4 + sz
              val needed = 8 * (
                (if (uncomp == 0xffffffffL) 1 else 0) +
                (if (comp == 0xffffffffL) 1 else 0) +
                (if (off == 0xffffffffL) 1 else 0))
              if (recEnd > eEnd || sz < needed) return None
              var vp = ep + 4
              if (uncomp == 0xffffffffL) { uncomp = le64(bytes, vp); vp += 8 }
              if (comp == 0xffffffffL) { comp = le64(bytes, vp); vp += 8 }
              if (off == 0xffffffffL) { off = le64(bytes, vp); vp += 8 }
              found = true
            } else ep += 4 + sz
          }
          if (!found) return None
        }
        if (method != 0 && method != 8) return None
        if (comp < 0 || uncomp < 0 || uncomp > MaxEntryBytes) return None
        if (off < 0 || off >= bytes.length) return None
        out += Entry(name, method, comp, uncomp, crc, off)
        pos += 46 + nameLen + extraLen + commentLen
        i += 1
      }
      val es = out.result()
      if (es.map(_.uncompSize).sum > MaxTotalBytes) None else Some(es)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Read + CRC-verify one entry's bytes through its local header. */
  def read(bytes: Array[Byte], e: Entry): Option[Array[Byte]] =
    try {
      val p = e.localOffset.toInt
      if (p + 30 > bytes.length || le32(bytes, p) != 0x04034b50L) return None
      val nameLen = le16(bytes, p + 26)
      val extraLen = le16(bytes, p + 28)
      val data = p + 30 + nameLen + extraLen
      // central-directory sizes, NOT local ones: streamed writers leave
      // the local fields zero behind a data descriptor
      if (data < 0 || data + e.compSize > bytes.length) return None
      val raw = e.method match {
        case 0 =>
          if (e.compSize != e.uncompSize) return None
          java.util.Arrays.copyOfRange(bytes, data, data + e.compSize.toInt)
        case 8 =>
          val inf = new Inflater(true)
          try {
            inf.setInput(bytes, data, e.compSize.toInt)
            val out = new Array[Byte](e.uncompSize.toInt)
            var got = 0
            while (!inf.finished()) {
              if (got < out.length) {
                val k = inf.inflate(out, got, out.length - got)
                if (k == 0 && !inf.finished()) return None // truncated
                got += k
              } else {
                // claimed size reached: the stream must END here — a
                // zero-length entry still needs one inflate call to
                // reach finished(), and one extra byte means the
                // central directory lied small
                val scratch = new Array[Byte](1)
                if (inf.inflate(scratch) > 0) return None
                if (!inf.finished()) return None
              }
            }
            if (got != e.uncompSize) return None
            out
          } finally inf.end()
        case _ => return None
      }
      val crc = new CRC32()
      crc.update(raw)
      if (crc.getValue != e.crc) None else Some(raw)
    } catch { case scala.util.control.NonFatal(_) => None }

  def readByName(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    entries(bytes).flatMap(_.find(_.name == name)).flatMap(read(bytes, _))

  // ------------------------------------------------------------------
  // DOCX (WordprocessingML) metadata over the container
  // ------------------------------------------------------------------

  private val WNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
  private val DcNs = "http://purl.org/dc/elements/1.1/"

  final case class DocxMeta(
      nEntries: Int,
      nParagraphs: Int,
      nWords: Int,
      title: String,
      creator: String,
      hasMacros: Boolean,
      hasExternalRef: Boolean,
      docMethod: String, // "stored" | "deflate" — proves both paths run
      zip64: Boolean)

  /** Hardened parse: same entity/doctype refusal as the SVG/sitemap
    * walkers, silent error handler (no per-row stderr at 100 TB). The
    * builder comes from the shared thread-local ([[graft.util.HardenedXml]])
    * — per-row JAXP factory construction dominated the docx walk. */
  private def parseXml(raw: Array[Byte]): Option[org.w3c.dom.Document] =
    try {
      val text = new String(raw, UTF_8)
      if (text.contains("<!ENTITY") || text.contains("<!DOCTYPE")) return None
      Some(graft.util.HardenedXml.builder().parse(new ByteArrayInputStream(raw)))
    } catch { case scala.util.control.NonFatal(_) => None }

  def docxMeta(bytes: Array[Byte]): Option[DocxMeta] =
    try {
      val es = entries(bytes) match {
        case Some(v) => v
        case None => return None
      }
      val byName = es.map(e => e.name -> e).toMap
      val docEntry = byName.get("word/document.xml") match {
        case Some(e) => e
        case None => return None // not a docx
      }
      if (!byName.contains("[Content_Types].xml")) return None
      val docRaw = read(bytes, docEntry) match {
        case Some(b) => b
        case None => return None // CRC or inflate lie
      }
      val doc = parseXml(docRaw) match {
        case Some(d) => d
        case None => return None
      }
      val paras = doc.getElementsByTagNameNS(WNs, "p")
      val texts = doc.getElementsByTagNameNS(WNs, "t")
      var words = 0
      var i = 0
      while (i < texts.getLength) {
        val t = texts.item(i).getTextContent
        if (t != null) words += t.trim.split("\\s+").count(_.nonEmpty)
        i += 1
      }
      var title = ""
      var creator = ""
      byName.get("docProps/core.xml").flatMap(read(bytes, _))
        .flatMap(parseXml).foreach { core =>
          val ts = core.getElementsByTagNameNS(DcNs, "title")
          if (ts.getLength > 0) title = ts.item(0).getTextContent
          val cs = core.getElementsByTagNameNS(DcNs, "creator")
          if (cs.getLength > 0) creator = cs.item(0).getTextContent
        }
      val hasMacros = byName.contains("word/vbaProject.bin")
      val hasExternal = byName.get("word/_rels/document.xml.rels")
        .flatMap(read(bytes, _)).flatMap(parseXml).exists { rels =>
          val all = rels.getElementsByTagName("*")
          (0 until all.getLength).exists { j =>
            val e = all.item(j).asInstanceOf[org.w3c.dom.Element]
            e.getLocalName == "Relationship" &&
              e.getAttribute("TargetMode") == "External"
          }
        }
      // EOCD-saturation recheck for the zip64 flag (entries() already
      // resolved it; re-derive cheaply from the tail)
      val zip64 = {
        var eocd = -1
        val lo = math.max(0, bytes.length - 22 - 0xffff)
        var p = bytes.length - 22
        while (p >= lo && eocd < 0) {
          if (le32(bytes, p) == 0x06054b50L) eocd = p
          p -= 1
        }
        eocd >= 20 && le32(bytes, eocd - 20) == 0x07064b50L
      }
      Some(DocxMeta(es.size, paras.getLength, words, title, creator,
        hasMacros, hasExternal,
        if (docEntry.method == 0) "stored" else "deflate", zip64))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // Writer — fixtures and round-trip proofs
  // ------------------------------------------------------------------

  private def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def w64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 << 10)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Serialize (name, bytes, method) entries. `forceZip64` writes the
    * streamed-writer shape: saturated central fields + 0x0001 extras and
    * an EOCD64 + locator — valid per APPNOTE even for tiny archives. */
  def encode(items: Vector[(String, Array[Byte], Int)],
      forceZip64: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val central = new java.io.ByteArrayOutputStream()
    items.foreach { case (name, data, method) =>
      val nameB = name.getBytes(UTF_8)
      val crc = new CRC32(); crc.update(data)
      val comp = if (method == 8) deflateRaw(data) else data
      val offset = out.size().toLong
      // local header (real sizes: the reader must still prefer central's)
      w32(out, 0x04034b50L); w16(out, 20); w16(out, 0); w16(out, method)
      w32(out, 0) // dos time+date: fixed zero, reproducible output
      w32(out, crc.getValue); w32(out, comp.length.toLong)
      w32(out, data.length.toLong); w16(out, nameB.length); w16(out, 0)
      out.write(nameB); out.write(comp)
      // central entry
      w32(central, 0x02014b50L); w16(central, 20); w16(central, 20)
      w16(central, 0); w16(central, method); w32(central, 0)
      w32(central, crc.getValue)
      if (forceZip64) {
        w32(central, 0xffffffffL); w32(central, 0xffffffffL)
        w16(central, nameB.length); w16(central, 4 + 24)
        // commentLen, diskStart, internal attrs, external attrs
        w16(central, 0); w16(central, 0); w16(central, 0); w32(central, 0)
        w32(central, 0xffffffffL)
        central.write(nameB)
        // 0x0001 extra: uncomp, comp, offset (all saturated above)
        w16(central, 1); w16(central, 24)
        w64(central, data.length.toLong); w64(central, comp.length.toLong)
        w64(central, offset)
      } else {
        w32(central, comp.length.toLong); w32(central, data.length.toLong)
        w16(central, nameB.length); w16(central, 0)
        // commentLen, diskStart, internal attrs, external attrs
        w16(central, 0); w16(central, 0); w16(central, 0); w32(central, 0)
        w32(central, offset)
        central.write(nameB)
      }
    }
    val cdOffset = out.size().toLong
    val cd = central.toByteArray
    out.write(cd)
    if (forceZip64) {
      val e64At = out.size().toLong
      w32(out, 0x06064b50L); w64(out, 44) // size of remainder
      w16(out, 45); w16(out, 45); w32(out, 0); w32(out, 0)
      w64(out, items.size.toLong); w64(out, items.size.toLong)
      w64(out, cd.length.toLong); w64(out, cdOffset)
      // locator
      w32(out, 0x07064b50L); w32(out, 0); w64(out, e64At); w32(out, 1)
      // saturated EOCD
      w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
      w16(out, 0xffff); w16(out, 0xffff)
      w32(out, 0xffffffffL); w32(out, 0xffffffffL); w16(out, 0)
    } else {
      w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
      w16(out, items.size); w16(out, items.size)
      w32(out, cd.length.toLong); w32(out, cdOffset); w16(out, 0)
    }
    out.toByteArray
  }

  final case class DocxSpec(
      nParagraphs: Int,
      wordsPerPara: Int,
      title: String,
      creator: String,
      macros: Boolean,
      externalRef: Boolean,
      storedDocument: Boolean,
      zip64: Boolean)

  def encodeDocx(spec: DocxSpec): Array[Byte] = {
    val paras = (0 until spec.nParagraphs).map { p =>
      val words = (0 until spec.wordsPerPara).map(k => s"tok${p}_$k").mkString(" ")
      s"<w:p><w:r><w:t>$words</w:t></w:r></w:p>"
    }.mkString
    val document =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$WNs"><w:body>$paras<w:sectPr/></w:body></w:document>""".stripMargin
    val core =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="$DcNs">
         |<dc:title>${spec.title}</dc:title><dc:creator>${spec.creator}</dc:creator>
         |</cp:coreProperties>""".stripMargin
    val app =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Properties xmlns="http://schemas.openxmlformats.org/officeDocument/2006/extended-properties">
         |<Pages>1</Pages><Words>${spec.nParagraphs * spec.wordsPerPara}</Words>
         |</Properties>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin
    val extRel =
      if (spec.externalRef)
        """<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/attachedTemplate" Target="https://cdn.tracker.test/t.dotx" TargetMode="External"/>"""
      else ""
    val docRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>$extRel
         |</Relationships>""".stripMargin
    val docMethod = if (spec.storedDocument) 0 else 8
    val items = Vector.newBuilder[(String, Array[Byte], Int)]
    items += (("[Content_Types].xml", contentTypes.getBytes(UTF_8), 8))
    items += (("_rels/.rels", rootRels.getBytes(UTF_8), 8))
    items += (("word/document.xml", document.getBytes(UTF_8), docMethod))
    items += (("word/_rels/document.xml.rels", docRels.getBytes(UTF_8), 8))
    items += (("docProps/core.xml", core.getBytes(UTF_8), 8))
    items += (("docProps/app.xml", app.getBytes(UTF_8), 0))
    if (spec.macros)
      items += (("word/vbaProject.bin",
        Array.tabulate(64)(i => (i * 7).toByte), 8))
    encode(items.result(), forceZip64 = spec.zip64)
  }
}
