package graft.functions

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.security.MessageDigest
import java.util.zip.{CRC32, Deflater, GZIPInputStream, Inflater}

/** WARC (ISO 28500, WARC/1.0 and /1.1) archive reader + writer.
  *
  * WARC is the wire format a web-scale crawl pipeline actually ingests and
  * emits (Common Crawl publishes petabytes of it), so a fetch scheduler
  * that cannot read or write it leaves its own output stranded. This module
  * walks the record grammar end to end:
  *
  *   - version line `WARC/1.x CRLF`, named fields (RFC 5322-style, with
  *     SP/HT continuation folding), `CRLF` blank line, a Content-Length
  *     byte block, and the `CRLF CRLF` record terminator;
  *   - per-record gzip members (the spec's RECOMMENDED compression layout:
  *     each record its own member so readers can seek) — the reader splits
  *     members itself with raw `Inflater` walks and verifies each member's
  *     CRC32 + ISIZE trailer, because `GZIPInputStream` hides member
  *     boundaries and swallows trailing garbage;
  *   - HTTP response blocks (`application/http;msgtype=response`): status
  *     line, headers, payload;
  *   - `WARC-Payload-Digest` verification (`sha1:` + RFC 4648 base32 over
  *     the HTTP payload) — the integrity check a republish pipeline runs
  *     before trusting archived bytes.
  *
  * Like every walker in this package the parse is bounded (decompressed
  * size, record count, header count/size caps) and NEVER throws on hostile
  * input — a truncated or lying archive classifies as `None`; at 100 TB a
  * malformed file is routine input, not an exception. Content rendering of
  * archived pages is out of scope (that is the fetch pipeline's job); this
  * module owns the container.
  */
object Warc {

  /** Decompressed-archive cap: a lying gzip bomb stops here, not at OOM. */
  val MaxArchiveBytes: Int = 64 << 20
  val MaxRecords = 10000
  val MaxHeaderCount = 128
  val MaxHeaderLine = 8192

  final case class Record(
      version: String,
      headers: Vector[(String, String)],
      block: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def warcType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = {
      // WARC/1.0 writers often wrap the URI in <>; 1.1 forbids it. Accept both.
      val raw = header("WARC-Target-URI").getOrElse("")
      if (raw.length >= 2 && raw.head == '<' && raw.last == '>')
        raw.substring(1, raw.length - 1)
      else raw
    }
  }

  final case class HttpMsg(
      status: Int,
      headers: Vector[(String, String)],
      body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  }

  def isGzip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  def isWarc(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      (startsWith(bytes, 0, "WARC/") || (isGzip(bytes) && {
        // peek the first member's first bytes without a full inflate
        gunzipBounded(bytes, 16).exists(startsWith(_, 0, "WARC/"))
      }))

  private def startsWith(b: Array[Byte], off: Int, s: String): Boolean = {
    if (off + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Decompress up to `cap` bytes of a (possibly multi-member) gzip stream.
    * `GZIPInputStream` reads concatenated members transparently, which is
    * exactly right here — record boundaries come from the WARC grammar,
    * not from member boundaries. */
  private def gunzipBounded(bytes: Array[Byte], cap: Int): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      try Some(in.readNBytes(cap))
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Count and CRC-verify the gzip members of a stream by walking each
    * member's header, deflate body, and CRC32+ISIZE trailer with a raw
    * `Inflater`. Returns None on any malformed member. The writer below
    * emits one member per record (the spec's seekable layout) and the
    * specs prove it with this walk — `GZIPInputStream` could never show
    * the boundary. */
  def gzipMemberSizes(bytes: Array[Byte]): Option[Vector[Int]] =
    try {
      var pos = 0
      val sizes = Vector.newBuilder[Int]
      var n = 0
      while (pos < bytes.length) {
        if (n >= MaxRecords * 2) return None
        val start = pos
        // --- member header (RFC 1952 §2.3) ---
        if (pos + 10 > bytes.length) return None
        if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b ||
            (bytes(pos + 2) & 0xff) != 8) return None
        val flg = bytes(pos + 3) & 0xff
        pos += 10
        if ((flg & 4) != 0) { // FEXTRA
          if (pos + 2 > bytes.length) return None
          val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
          pos += 2 + xlen
        }
        if ((flg & 8) != 0) pos = skipZeroTerminated(bytes, pos) // FNAME
        if ((flg & 16) != 0) pos = skipZeroTerminated(bytes, pos) // FCOMMENT
        if ((flg & 2) != 0) pos += 2 // FHCRC
        if (pos < 0 || pos > bytes.length) return None
        // --- deflate body ---
        val inf = new Inflater(true)
        try {
          inf.setInput(bytes, pos, bytes.length - pos)
          val crc = new CRC32()
          val buf = new Array[Byte](64 << 10)
          var out = 0L
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            if (k == 0 && !inf.finished()) return None // truncated/needs-dict
            crc.update(buf, 0, k)
            out += k
            if (out > MaxArchiveBytes) return None
          }
          pos = bytes.length - inf.getRemaining
          // --- trailer: CRC32 + ISIZE, little-endian ---
          if (pos + 8 > bytes.length) return None
          val wantCrc = le32(bytes, pos)
          val wantLen = le32(bytes, pos + 4)
          if (wantCrc != crc.getValue) return None
          if (wantLen != (out & 0xffffffffL)) return None
          pos += 8
        } finally inf.end()
        sizes += (pos - start)
        n += 1
      }
      Some(sizes.result())
    } catch { case scala.util.control.NonFatal(_) => None }

  private def skipZeroTerminated(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p < b.length && b(p) != 0) p += 1
    if (p >= b.length) -1 else p + 1
  }

  private def le32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Parse every record of a WARC archive (gzipped or plain). None on any
    * grammar violation — never throws. */
  def parseAll(bytes: Array[Byte]): Option[Vector[Record]] =
    try {
      if (bytes == null || bytes.length < 5) return None
      val raw =
        if (isGzip(bytes)) gunzipBounded(bytes, MaxArchiveBytes + 1) match {
          case Some(b) if b.length <= MaxArchiveBytes => b
          case _ => return None // bomb or broken stream
        }
        else bytes
      var pos = 0
      val recs = Vector.newBuilder[Record]
      var n = 0
      while (pos < raw.length) {
        if (n >= MaxRecords) return None
        parseRecord(raw, pos) match {
          case Some((rec, next)) =>
            recs += rec; pos = next; n += 1
            // tolerate extra CRLFs between records (some writers pad)
            while (pos < raw.length && (raw(pos) == '\r' || raw(pos) == '\n')) pos += 1
          case None => return None
        }
      }
      val out = recs.result()
      if (out.isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One record at `pos`: returns (record, offset just past the CRLF CRLF
    * terminator). */
  private def parseRecord(raw: Array[Byte], pos0: Int): Option[(Record, Int)] = {
    var pos = pos0
    // version line
    val vEnd = lineEnd(raw, pos)
    if (vEnd < 0) return None
    val vLine = new String(raw, pos, vEnd - pos, US_ASCII)
    if (!vLine.startsWith("WARC/")) return None
    val version = vLine.substring(5).trim
    if (version.isEmpty || version.length > 8) return None
    pos = skipEol(raw, vEnd)
    // named fields with SP/HT continuation folding
    val headers = Vector.newBuilder[(String, String)]
    var count = 0
    var lastKey: String = null
    var lastVal: String = null
    var done = false
    while (!done) {
      val e = lineEnd(raw, pos)
      if (e < 0 || e - pos > MaxHeaderLine) return None
      if (e == pos) { // blank line: end of header
        done = true
        pos = skipEol(raw, e)
      } else {
        val line = new String(raw, pos, e - pos, UTF_8)
        if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
          if (lastKey == null) return None
          lastVal = lastVal + " " + line.trim
        } else {
          if (lastKey != null) { headers += ((lastKey, lastVal)); count += 1 }
          if (count > MaxHeaderCount) return None
          val c = line.indexOf(':')
          if (c <= 0) return None
          lastKey = line.substring(0, c).trim
          lastVal = line.substring(c + 1).trim
        }
        pos = skipEol(raw, e)
      }
    }
    if (lastKey != null) headers += ((lastKey, lastVal))
    val rec0 = Record(version, headers.result(), Array.emptyByteArray)
    val len = rec0.header("Content-Length").flatMap(s => s.toLongOption) match {
      case Some(l) if l >= 0 && l <= raw.length - pos => l.toInt
      case _ => return None // absent, negative, or lying Content-Length
    }
    val block = java.util.Arrays.copyOfRange(raw, pos, pos + len)
    pos += len
    // record terminator: two CRLFs (tolerate bare-LF writers)
    var eols = 0
    while (eols < 2 && pos < raw.length &&
        (raw(pos) == '\r' || raw(pos) == '\n')) {
      if (raw(pos) == '\r' && pos + 1 < raw.length && raw(pos + 1) == '\n') pos += 2
      else pos += 1
      eols += 1
    }
    if (eols < 2 && pos < raw.length) return None
    Some((rec0.copy(block = block), pos))
  }

  private def lineEnd(raw: Array[Byte], from: Int): Int = {
    var p = from
    while (p < raw.length && raw(p) != '\n' && raw(p) != '\r') p += 1
    if (p >= raw.length) -1 else p
  }

  private def skipEol(raw: Array[Byte], at: Int): Int =
    if (at < raw.length && raw(at) == '\r' &&
        at + 1 < raw.length && raw(at + 1) == '\n') at + 2
    else if (at < raw.length && (raw(at) == '\n' || raw(at) == '\r')) at + 1
    else at

  /** Parse an `application/http;msgtype=response` block. */
  def httpResponse(block: Array[Byte]): Option[HttpMsg] =
    try {
      var pos = 0
      val e0 = lineEnd(block, pos)
      if (e0 < 0) return None
      val status = new String(block, 0, e0, US_ASCII) match {
        case s if s.startsWith("HTTP/1.") =>
          val parts = s.split(" ", 3)
          if (parts.length < 2) return None
          parts(1).toIntOption match {
            case Some(c) if c >= 100 && c <= 599 => c
            case _ => return None
          }
        case _ => return None
      }
      pos = skipEol(block, e0)
      val headers = Vector.newBuilder[(String, String)]
      var done = false
      var count = 0
      while (!done) {
        val e = lineEnd(block, pos)
        if (e < 0) return None
        if (e == pos) { done = true; pos = skipEol(block, e) }
        else {
          val line = new String(block, pos, e - pos, UTF_8)
          val c = line.indexOf(':')
          if (c <= 0) return None
          headers += ((line.substring(0, c).trim, line.substring(c + 1).trim))
          count += 1
          if (count > MaxHeaderCount) return None
          pos = skipEol(block, e)
        }
      }
      Some(HttpMsg(status, headers.result(),
        java.util.Arrays.copyOfRange(block, pos, block.length)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** `sha1:` + RFC 4648 base32 of the bytes — the WARC-Payload-Digest
    * labelled-digest form Common Crawl uses. */
  def sha1Digest(payload: Array[Byte]): String = {
    val sha = MessageDigest.getInstance("SHA-1").digest(payload)
    "sha1:" + base32(sha)
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private def base32(b: Array[Byte]): String = {
    val sb = new StringBuilder
    var bits = 0
    var acc = 0L
    var i = 0
    while (i < b.length) {
      acc = (acc << 8) | (b(i) & 0xff)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(B32(((acc >> bits) & 31).toInt))
      }
      i += 1
    }
    if (bits > 0) sb.append(B32(((acc << (5 - bits)) & 31).toInt))
    // sha1 is 160 bits = exactly 32 base32 chars: no '=' padding needed
    sb.toString
  }

  // ------------------------------------------------------------------
  // Archive-level metadata — the per-file triage a republish pipeline
  // runs before trusting archived bytes.
  // ------------------------------------------------------------------

  final case class ArchiveMeta(
      version: String,
      gzipped: Boolean,
      nRecords: Int,
      nResponses: Int,
      httpStatus: Int,       // first response record's status (-1 if none)
      contentType: String,   // first response's Content-Type, param-stripped
      payloadLen: Long,      // first response's HTTP payload length
      digestOk: Boolean,     // every labelled payload digest verifies
      hasRevisit: Boolean)

  def archiveMeta(bytes: Array[Byte]): Option[ArchiveMeta] = {
    val gz = isGzip(bytes)
    parseAll(bytes).map { recs =>
      var nResp = 0
      var status = -1
      var ctype = ""
      var plen = -1L
      var digestOk = true
      var revisit = false
      recs.foreach { r =>
        r.warcType match {
          case "response" =>
            nResp += 1
            httpResponse(r.block).foreach { msg =>
              if (status < 0) {
                status = msg.status
                ctype = msg.header("Content-Type")
                  .map(_.split(";")(0).trim.toLowerCase).getOrElse("")
                plen = msg.body.length.toLong
              }
              r.header("WARC-Payload-Digest").foreach { want =>
                if (want != sha1Digest(msg.body)) digestOk = false
              }
            }
          case "revisit" => revisit = true
          case _ =>
        }
      }
      ArchiveMeta(recs.head.version, gz, recs.size, nResp,
        status, ctype, plen, digestOk, revisit)
    }
  }

  // ------------------------------------------------------------------
  // CDX indexing — the (offset, length)-addressed index every web
  // archive builds over its WARC files so replay is a seek, not a scan.
  // ------------------------------------------------------------------

  /** Every record with the (offset, length) a replayer needs: for a
    * gzipped archive they address the COMPRESSED file (the gzip member
    * holding the record — seek, read `length`, gunzip, parse); for a
    * plain archive they address raw bytes. A multi-record member (legal
    * but non-seekable layout) gives each contained record the member's
    * coordinates. None on any malformed member or record — never throws. */
  def recordsWithOffsets(bytes: Array[Byte]): Option[Vector[(Record, Long, Long)]] =
    try {
      if (bytes == null || bytes.length < 5) return None
      val out = Vector.newBuilder[(Record, Long, Long)]
      if (isGzip(bytes)) {
        val sizes = gzipMemberSizes(bytes).getOrElse(return None)
        var off = 0
        var total = 0
        sizes.foreach { len =>
          val slice = java.util.Arrays.copyOfRange(bytes, off, off + len)
          val raw = gunzipBounded(slice, MaxArchiveBytes + 1) match {
            case Some(b) if b.length <= MaxArchiveBytes => b
            case _ => return None
          }
          parseAll(raw) match {
            case Some(recs) =>
              total += recs.size
              if (total > MaxRecords) return None
              recs.foreach(r => out += ((r, off.toLong, len.toLong)))
            case None => return None
          }
          off += len
        }
      } else {
        var pos = 0
        var n = 0
        while (pos < bytes.length) {
          if (n >= MaxRecords) return None
          parseRecord(bytes, pos) match {
            case Some((rec, next)) =>
              out += ((rec, pos.toLong, (next - pos).toLong))
              pos = next; n += 1
              while (pos < bytes.length &&
                  (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
            case None => return None
          }
        }
      }
      val v = out.result()
      if (v.isEmpty) None else Some(v)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One CDX(J) index entry: the SURT search key, 14-digit timestamp,
    * and the replay coordinates. */
  final case class CdxLine(
      surtKey: String, ts: String, url: String, mime: String,
      status: Int, digest: String, offset: Long, length: Long,
      filename: String) {
    /** The OpenWayback/pywb CDXJ serialization: `key ts {json}`. */
    def toCdxj: String = {
      def esc(s: String) =
        s.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""$surtKey $ts {"url": "${esc(url)}", "mime": "${esc(mime)}", """ +
        s""""status": "$status", "digest": "${esc(digest)}", """ +
        s""""length": "$length", "offset": "$offset", """ +
        s""""filename": "${esc(filename)}"}"""
    }
  }

  /** Index an archive: one CdxLine per response record, in file order.
    * None when the archive itself is malformed (quarantine upstream);
    * an archive with no responses indexes to an empty vector. */
  def cdxLines(filename: String, bytes: Array[Byte]): Option[Vector[CdxLine]] =
    recordsWithOffsets(bytes).map { recs =>
      recs.collect { case (r, off, len) if r.warcType == "response" =>
        val (status, mime, digest) = httpResponse(r.block) match {
          case Some(msg) => (msg.status,
            msg.header("Content-Type")
              .map(_.split(";")(0).trim.toLowerCase).getOrElse(""),
            r.header("WARC-Payload-Digest").getOrElse(sha1Digest(msg.body)))
          case None => (-1, "", "")
        }
        CdxLine(Surt.key(r.targetUri),
          Surt.ts14(r.header("WARC-Date").getOrElse("")),
          r.targetUri, mime, status, digest, off, len, filename)
      }
    }

  // ------------------------------------------------------------------
  // WET — the text-extraction sibling format (WARC `conversion`
  // records, UTF-8 plain text): THE ingest format for LLM text
  // corpora (Common Crawl publishes every snapshot as WET).
  // ------------------------------------------------------------------

  /** Every conversion record's (target URI, UTF-8 text), in file order.
    * None when the archive is malformed; an archive without conversion
    * records extracts to an empty vector. */
  def wetTexts(bytes: Array[Byte]): Option[Vector[(String, String)]] =
    parseAll(bytes).map { recs =>
      recs.collect { case r if r.warcType == "conversion" =>
        (r.targetUri, new String(r.block, UTF_8))
      }
    }

  // ------------------------------------------------------------------
  // Writer — the crawl engine's archival sink format. One gzip member
  // per record (ISO 28500 annex D's seekable layout) when gzip=true.
  // ------------------------------------------------------------------

  final case class RecordSpec(
      warcType: String,
      targetUri: Option[String],
      block: Array[Byte],
      contentTypeHdr: String,
      extraHeaders: Vector[(String, String)] = Vector.empty)

  def httpResponseBlock(status: Int, contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    val reason = status match {
      case 200 => "OK"
      case 301 => "Moved Permanently"
      case 404 => "Not Found"
      case _ => "Status"
    }
    val head = s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes(US_ASCII) ++ payload
  }

  def httpRequestBlock(uri: String, host: String): Array[Byte] =
    (s"GET $uri HTTP/1.1\r\nHost: $host\r\nUser-Agent: graft\r\n\r\n")
      .getBytes(US_ASCII)

  /** Serialize records as WARC/`version`. Record IDs and dates must be
    * supplied by the caller (deterministic in tests/fixtures). */
  def encode(version: String, records: Vector[(RecordSpec, String, String)],
      gzipPerRecord: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (spec, recordId, date) =>
      encodeRecordTo(out, version, spec, recordId, date, gzipPerRecord)
    }
    out.toByteArray
  }

  /** Serialize ONE record to `out` — the streaming unit [[encode]] loops
    * over, exposed so the egress sink can write record-at-a-time to an
    * arbitrary OutputStream (Hadoop FSDataOutputStream on a cluster)
    * without buffering a whole partition (guide §5: task memory must not
    * scale with partition size). Byte-identical to [[encode]] by
    * construction: [[encode]] delegates here. */
  def encodeRecordTo(out: java.io.OutputStream, version: String,
      spec: RecordSpec, recordId: String, date: String,
      gzipPerRecord: Boolean): Unit = {
    val hdr = new StringBuilder
    hdr.append("WARC/").append(version).append("\r\n")
    hdr.append("WARC-Type: ").append(spec.warcType).append("\r\n")
    hdr.append("WARC-Record-ID: <").append(recordId).append(">\r\n")
    hdr.append("WARC-Date: ").append(date).append("\r\n")
    spec.targetUri.foreach { u =>
      // the <>-wrapped 1.0 form vs the bare 1.1 form, both round-trip
      val v = if (version == "1.0") s"<$u>" else u
      hdr.append("WARC-Target-URI: ").append(v).append("\r\n")
    }
    hdr.append("Content-Type: ").append(spec.contentTypeHdr).append("\r\n")
    spec.extraHeaders.foreach { case (k, v) =>
      hdr.append(k).append(": ").append(v).append("\r\n")
    }
    hdr.append("Content-Length: ").append(spec.block.length).append("\r\n\r\n")
    val recBytes = hdr.toString.getBytes(UTF_8) ++ spec.block ++
      "\r\n\r\n".getBytes(US_ASCII)
    if (gzipPerRecord) out.write(gzipMember(recBytes))
    else out.write(recBytes)
  }

  /** One complete RFC 1952 member (header + deflate + CRC32/ISIZE trailer)
    * with zeroed MTIME so identical input bytes always serialize
    * identically — archival output must be reproducible. */
  private def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    try {
      def_.setInput(data)
      def_.finish()
      val buf = new Array[Byte](64 << 10)
      while (!def_.finished()) {
        val k = def_.deflate(buf)
        out.write(buf, 0, k)
      }
    } finally def_.end()
    val crc = new CRC32()
    crc.update(data)
    val tr = new Array[Byte](8)
    writeLe32(tr, 0, crc.getValue)
    writeLe32(tr, 4, data.length.toLong & 0xffffffffL)
    out.write(tr)
    out.toByteArray
  }

  private def writeLe32(b: Array[Byte], p: Int, v: Long): Unit = {
    b(p) = (v & 0xff).toByte
    b(p + 1) = ((v >> 8) & 0xff).toByte
    b(p + 2) = ((v >> 16) & 0xff).toByte
    b(p + 3) = ((v >> 24) & 0xff).toByte
  }
}
