package graft.functions

import java.util.zip.Inflater

/** PDF document METADATA — header version, page count, the encryption
  * flag, and the two republish-scrub signals a training pipeline checks
  * on every crawled PDF: `has_js` (document-level JavaScript — the
  * OpenAction / name-tree auto-run vector) and `has_attachments`
  * (embedded files riding an innocent-looking document). Extracted by
  * walking the REAL cross-reference machinery of ISO 32000-1: the
  * `startxref` pointer, classic xref TABLES (multi-subsection),
  * cross-reference STREAMS (§7.5.8: /W field widths, /Index runs,
  * FlateDecode + PNG predictors), compressed-object STREAMS (§7.5.7
  * ObjStm, type-2 entries), and incremental-update /Prev chains with
  * newest-entry-wins merge — the shapes every real-world writer emits.
  * Page count is the root Pages node's /Count (authoritative over the
  * whole tree per §7.7.3.2), so no page-tree recursion is needed.
  *
  * The honest split, same discipline as [[Mp4]]/[[Mpeg]]: CONTENT
  * decode (text extraction, fonts, images) needs a full PDF renderer
  * and is out of scope; the COS/xref layer above is complete. When the
  * document is encrypted only STRINGS and STREAMS are enciphered
  * (§7.6.2) — dictionary structure stays plaintext and xref/ObjStm
  * metadata streams are exempt in the forms walked here, so the fields
  * this module emits remain readable and `encrypted` is reported
  * alongside them.
  *
  * Hostile-input posture: one shared token budget per walk, bounded
  * recursion, bounded inflate output, cycle guards on object
  * resolution and /Prev chains — a lying offset, length, or
  * self-referential object classifies in O(budget), never throws and
  * never overruns. */
object Pdf {

  final case class Meta(
      version: String, // "1.4".."2.0" from the %PDF- header comment
      nPages: Long, // root Pages /Count; -1 when unresolvable
      encrypted: Boolean, // trailer carries /Encrypt
      hasJs: Boolean, // OpenAction JavaScript or /Names /JavaScript tree
      hasAttachments: Boolean, // /Names /EmbeddedFiles present
      xrefKind: String, // "table" | "stream" — the startxref target's form
      incremental: Boolean) // a trailer /Prev chain was followed

  // ---- COS object model (strings are structural only — never decrypted)

  private sealed trait Obj
  private final case class Num(d: Double) extends Obj
  private final case class Name(s: String) extends Obj
  private case object Str extends Obj
  private final case class Arr(items: Vector[Obj]) extends Obj
  private final case class Dict(m: Map[String, Obj]) extends Obj
  private final case class Ref(num: Int, gen: Int) extends Obj
  private final case class Kw(s: String) extends Obj // true/false/null/obj/R/…
  private object Malformed extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  /** Sniff: the `%PDF-` header comment. The spec's own recognition rule
    * (§7.5.2); real-world files may prepend up to 1 KiB of junk, which
    * the full walk tolerates — the triage sniff checks offset 0 only. */
  def isPdf(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' && b(4) == '-'

  private val MaxTokens = 200000
  private val MaxDepth = 32
  private val MaxInflate = 16 << 20

  // ======================================================== tokenizer

  private final class Lexer(val b: Array[Byte]) {
    var p: Int = 0
    var budget: Int = MaxTokens
    private def spend(): Unit = { budget -= 1; if (budget < 0) throw Malformed }
    def at(i: Int): Int = if (i >= 0 && i < b.length) b(i) & 0xff else -1
    private def isWs(c: Int) = c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
    private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var run = true
      while (run) {
        while (p < b.length && isWs(at(p))) p += 1
        if (at(p) == '%') { // comment to EOL
          while (p < b.length && at(p) != 10 && at(p) != 13) p += 1
        } else run = false
      }
    }
    /** Regular token (name chars / number chars / keyword). */
    def token(): String = {
      spend(); skipWs()
      val s = p
      while (p < b.length && !isWs(at(p)) && !isDelim(at(p))) p += 1
      if (p == s) throw Malformed
      new String(b, s, p - s, java.nio.charset.StandardCharsets.US_ASCII)
    }
    def int(): Int = {
      val t = token()
      try t.toInt catch { case _: NumberFormatException => throw Malformed }
    }
    def expect(kw: String): Unit = if (token() != kw) throw Malformed

    def value(depth: Int): Obj = {
      spend()
      if (depth > MaxDepth) throw Malformed
      skipWs()
      at(p) match {
        case -1 => throw Malformed
        case '<' if at(p + 1) == '<' =>
          p += 2
          var m = Map.empty[String, Obj]
          var run = true
          while (run) {
            skipWs()
            if (at(p) == '>' && at(p + 1) == '>') { p += 2; run = false }
            else {
              val k = value(depth + 1) match {
                case Name(s) => s
                case _ => throw Malformed
              }
              m = m.updated(k, value(depth + 1))
            }
          }
          Dict(m)
        case '<' => // hex string — structural skip
          p += 1
          while (p < b.length && at(p) != '>') { spend(); p += 1 }
          if (at(p) != '>') throw Malformed
          p += 1; Str
        case '(' => // literal string: balanced parens, backslash escapes
          p += 1
          var nest = 1
          while (nest > 0) {
            spend()
            at(p) match {
              case -1 => throw Malformed
              case '\\' => p += 2
              case '(' => nest += 1; p += 1
              case ')' => nest -= 1; p += 1
              case _ => p += 1
            }
          }
          Str
        case '[' =>
          p += 1
          val items = Vector.newBuilder[Obj]
          var run = true
          while (run) {
            skipWs()
            if (at(p) == ']') { p += 1; run = false }
            else items += value(depth + 1)
          }
          Arr(items.result())
        case '/' =>
          p += 1
          val sb = new java.lang.StringBuilder
          var run = true
          while (run && p < b.length) {
            val c = at(p)
            if (isWs(c) || isDelim(c)) run = false
            else if (c == '#' && p + 2 < b.length) {
              val h = Integer.parseInt(new String(b, p + 1, 2,
                java.nio.charset.StandardCharsets.US_ASCII), 16)
              sb.append(h.toChar); p += 3
            } else { sb.append(c.toChar); p += 1 }
          }
          Name(sb.toString)
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val t = token()
          val n = try Num(t.toDouble) catch { case _: NumberFormatException => throw Malformed }
          // integer may head an indirect reference: `N G R`
          if (n.d == math.floor(n.d) && n.d >= 0 && !t.contains('.')) {
            val save = p
            val saveBudget = budget
            try {
              val g = int()
              if (g >= 0 && token() == "R") return Ref(n.d.toInt, g)
              p = save; budget = saveBudget
            } catch { case Malformed => p = save; budget = saveBudget }
          }
          n
        case _ =>
          token() match {
            case "true" => Kw("true")
            case "false" => Kw("false")
            case "null" => Kw("null")
            case _ => throw Malformed
          }
      }
    }
  }

  // ============================================== filters / predictors

  private[graft] def inflateBounded(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4 + 64, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput() && out.size < MaxInflate) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) throw Malformed
        out.write(buf, 0, n)
      }
      if (out.size >= MaxInflate) throw Malformed // decompression bomb
      // a TRUNCATED deflate stream exits the loop via needsInput() without
      // finishing — reject at the filter layer instead of handing partial
      // xref/ObjStm bytes to a parser that could read plausible-but-wrong
      // entries before a downstream check trips
      if (!inf.finished()) throw Malformed
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => throw Malformed
    } finally inf.end()
  }

  /** PNG row defilter (predictors 10-15 share one per-row tag form). */
  private def pngDefilter(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    if (rowBytes <= 0 || data.length % (rowBytes + 1) != 0) throw Malformed
    val rows = data.length / (rowBytes + 1)
    val out = new Array[Byte](rows * rowBytes)
    val bpp = 1 // xref stream columns are byte-granular (BitsPerComponent 8)
    var r = 0
    while (r < rows) {
      val tag = data(r * (rowBytes + 1)) & 0xff
      val src = r * (rowBytes + 1) + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowBytes + i) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xff else 0
        val v = tag match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val pp = left + up - ul
            val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => throw Malformed
        }
        out(dst + i) = v.toByte
        i += 1
      }
      r += 1
    }
    out
  }

  // ==================================================== the document

  private final case class XEntry(kind: Int, a: Long, b2: Long) // kind: 1 offset / 2 objstm

  private final class Doc(bytes: Array[Byte]) {
    val lex = new Lexer(bytes)
    var entries = Map.empty[Int, XEntry]
    var trailer: Dict = Dict(Map.empty)
    var startKind = ""
    var incremental = false
    private var cache = Map.empty[Int, Obj]
    private var resolving = Set.empty[Int]
    private var objStmCache = Map.empty[Int, (Array[Byte], Map[Int, Int])]

    private def resolve(o: Obj, depth: Int = 0): Obj = o match {
      case Ref(n, _) if depth < MaxDepth => resolve(obj(n), depth + 1)
      case Ref(_, _) => throw Malformed
      case other => other
    }
    def dictAt(o: Obj): Option[Dict] = resolve(o) match {
      case d: Dict => Some(d)
      case _ => None
    }
    def numAt(o: Obj): Option[Long] = resolve(o) match {
      case Num(d) => Some(d.toLong)
      case _ => None
    }

    /** Parse `N G obj <value>` at a byte offset; when the object carries
      * a stream, decode it per /Filter and return it too. */
    private def parseIndirect(off: Long): (Int, Obj, Option[Array[Byte]]) = {
      if (off < 0 || off >= bytes.length) throw Malformed
      lex.p = off.toInt
      val num = lex.int()
      lex.int() // generation
      lex.expect("obj")
      val v = lex.value(0)
      lex.skipWs()
      // optional stream payload
      if (lex.at(lex.p) == 's' && lex.at(lex.p + 1) == 't' &&
          regionIs(lex.p, "stream")) {
        lex.p += 6
        if (lex.at(lex.p) == 13) lex.p += 1
        if (lex.at(lex.p) == 10) lex.p += 1
        val d = v match { case dd: Dict => dd; case _ => throw Malformed }
        // resolving an indirect /Length recurses through this lexer and
        // clobbers its position — pin the data start FIRST
        val dataStart = lex.p.toLong
        val len = numAt(d.m.getOrElse("Length", throw Malformed)).getOrElse(throw Malformed)
        if (len < 0 || dataStart + len > bytes.length) throw Malformed
        val raw = java.util.Arrays.copyOfRange(bytes, dataStart.toInt, (dataStart + len).toInt)
        (num, v, Some(decodeStream(d, raw)))
      } else (num, v, None)
    }

    private def regionIs(at: Int, s: String): Boolean =
      at + s.length <= bytes.length &&
        new String(bytes, at, s.length, java.nio.charset.StandardCharsets.US_ASCII) == s

    private def decodeStream(d: Dict, raw: Array[Byte]): Array[Byte] = {
      val filters: Vector[String] = d.m.get("Filter") match {
        case None => Vector.empty
        case Some(Name(s)) => Vector(s)
        case Some(Arr(items)) => items.map { case Name(s) => s; case _ => throw Malformed }
        case _ => throw Malformed
      }
      val parms: Vector[Option[Dict]] = d.m.get("DecodeParms") match {
        case None => Vector.fill(filters.length)(None)
        case Some(dd: Dict) => Vector(Some(dd))
        case Some(Arr(items)) => items.map {
          case dd: Dict => Some(dd)
          case Kw("null") => None
          case _ => throw Malformed
        }
        case _ => throw Malformed
      }
      var out = raw
      var i = 0
      while (i < filters.length) {
        filters(i) match {
          case "FlateDecode" | "Fl" =>
            out = inflateBounded(out)
            parms.lift(i).flatten.foreach { pd =>
              val pred = pd.m.get("Predictor").flatMap(numAt).getOrElse(1L)
              if (pred >= 10) {
                val cols = pd.m.get("Columns").flatMap(numAt).getOrElse(1L)
                val colors = pd.m.get("Colors").flatMap(numAt).getOrElse(1L)
                val bpc = pd.m.get("BitsPerComponent").flatMap(numAt).getOrElse(8L)
                val rowBytes = ((cols * colors * bpc + 7) / 8).toInt
                out = pngDefilter(out, rowBytes)
              } else if (pred != 1) throw Malformed // TIFF predictor: unseen in xref
            }
          case _ => throw Malformed // DCT/LZW/ASCII85…: content filters, out of scope
        }
        i += 1
      }
      out
    }

    /** Resolve object `n` through the xref map: a direct offset or a
      * type-2 hop into a compressed object stream. */
    def obj(n: Int): Obj = cache.get(n) match {
      case Some(o) => o
      case None =>
        if (resolving.contains(n)) throw Malformed // cyclic resolution
        resolving += n
        try {
          val o = entries.get(n) match {
            case Some(XEntry(1, off, _)) =>
              val (num, v, _) = parseIndirect(off)
              if (num != n) throw Malformed
              v
            case Some(XEntry(2, stmNum, idx)) =>
              val (data, offsets) = objStm(stmNum.toInt)
              val off = offsets.getOrElse(n, throw Malformed)
              if (idx < 0) throw Malformed
              val sub = new Lexer(data)
              sub.p = off
              sub.budget = lex.budget
              val v = sub.value(0)
              lex.budget = sub.budget
              v
            case _ => Kw("null")
          }
          cache = cache.updated(n, o)
          o
        } finally resolving -= n
    }

    /** Load + index a /Type /ObjStm: header pairs (objnum, offset) then
      * the packed object bodies starting at /First. */
    private def objStm(stmNum: Int): (Array[Byte], Map[Int, Int]) =
      objStmCache.get(stmNum) match {
        case Some(v) => v
        case None =>
          val off = entries.get(stmNum) match {
            case Some(XEntry(1, o, _)) => o
            case _ => throw Malformed // an ObjStm can't itself be compressed
          }
          val (num, v, data) = parseIndirect(off)
          val d = v match { case dd: Dict => dd; case _ => throw Malformed }
          if (num != stmNum || data.isEmpty) throw Malformed
          val n = numAt(d.m.getOrElse("N", throw Malformed)).getOrElse(throw Malformed)
          val first = numAt(d.m.getOrElse("First", throw Malformed)).getOrElse(throw Malformed)
          if (n < 0 || n > 8192 || first < 0) throw Malformed
          val payload = data.get
          val hdr = new Lexer(payload)
          hdr.budget = lex.budget
          var offsets = Map.empty[Int, Int]
          var i = 0L
          while (i < n) {
            val objNum = hdr.int()
            val rel = hdr.int()
            if (first + rel >= payload.length || rel < 0) throw Malformed
            offsets = offsets.updated(objNum, (first + rel).toInt)
            i += 1
          }
          lex.budget = hdr.budget
          val r = (payload, offsets)
          objStmCache = objStmCache.updated(stmNum, r)
          r
      }

    private def addEntry(n: Int, e: XEntry): Unit =
      if (!entries.contains(n)) entries = entries.updated(n, e) // newest wins

    /** Load the xref at `off` (table or stream) and follow /Prev. */
    def loadXref(off: Long, seen: Set[Long], depth: Int): Unit = {
      if (depth > 32 || seen.contains(off) || off < 0 || off >= bytes.length)
        throw Malformed
      lex.p = off.toInt
      lex.skipWs()
      val isTable = regionIs(lex.p, "xref") &&
        { val c = lex.at(lex.p + 4); !(c >= '0' && c <= '9') }
      val t: Dict =
        if (isTable) {
          lex.p += 4
          var run = true
          while (run) {
            lex.skipWs()
            if (regionIs(lex.p, "trailer")) { lex.p += 7; run = false }
            else {
              val start = lex.int()
              val count = lex.int()
              if (count < 0 || count > 1000000) throw Malformed
              var i = 0
              while (i < count) {
                val a = lex.token() // offset (10 digits, tolerated as int)
                lex.token() // generation
                val kind = lex.token()
                val offv = try a.toLong catch { case _: NumberFormatException => throw Malformed }
                if (kind == "n") addEntry(start + i, XEntry(1, offv, 0))
                else if (kind != "f") throw Malformed
                i += 1
              }
            }
          }
          lex.value(0) match { case d: Dict => d; case _ => throw Malformed }
        } else {
          val (_, v, data) = parseIndirect(off)
          val d = v match { case dd: Dict => dd; case _ => throw Malformed }
          if (!d.m.get("Type").contains(Name("XRef")) || data.isEmpty) throw Malformed
          val w = d.m.get("W") match {
            case Some(Arr(items)) if items.length == 3 =>
              items.map { case Num(x) => x.toInt; case _ => throw Malformed }
            case _ => throw Malformed
          }
          if (w.exists(x => x < 0 || x > 8)) throw Malformed
          val size = numAt(d.m.getOrElse("Size", throw Malformed)).getOrElse(throw Malformed)
          val index: Vector[Long] = d.m.get("Index") match {
            case Some(Arr(items)) => items.map { case Num(x) => x.toLong; case _ => throw Malformed }
            case None => Vector(0L, size)
            case _ => throw Malformed
          }
          if (index.length % 2 != 0) throw Malformed
          val payload = data.get
          val rowLen = w.sum
          var p = 0
          def field(width: Int): Long = {
            var v = 0L; var i = 0
            while (i < width) { v = (v << 8) | (payload(p) & 0xffL); p += 1; i += 1 }
            v
          }
          index.grouped(2).foreach { g =>
            val (start, count) = (g(0), g(1))
            if (count < 0 || count > 1000000) throw Malformed
            var i = 0L
            while (i < count) {
              if (p + rowLen > payload.length) throw Malformed
              val f1 = if (w(0) == 0) 1L else field(w(0))
              val f2 = field(w(1))
              val f3 = field(w(2))
              f1 match {
                case 1 => addEntry((start + i).toInt, XEntry(1, f2, f3))
                case 2 => addEntry((start + i).toInt, XEntry(2, f2, f3))
                case _ => () // type 0 (free) and unknown types: skip per spec
              }
              i += 1
            }
          }
          d
        }
      if (startKind.isEmpty) startKind = if (isTable) "table" else "stream"
      if (trailer.m.isEmpty) trailer = t
      t.m.get("Prev").flatMap(numAt).foreach { prev =>
        incremental = true
        loadXref(prev, seen + off, depth + 1)
      }
    }
  }

  // ============================================================ walk

  def docMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (bytes == null || bytes.length < 32) return None
      // header: %PDF-M.N within the first KiB (writers may prepend junk)
      val headWindow = new String(bytes, 0,
        math.min(bytes.length, 1024), java.nio.charset.StandardCharsets.ISO_8859_1)
      val hIdx = headWindow.indexOf("%PDF-")
      if (hIdx < 0) return None
      val vEnd = math.min(hIdx + 8, headWindow.length)
      val version = headWindow.substring(hIdx + 5, vEnd).takeWhile(c => c.isDigit || c == '.')
      if (!version.matches("\\d\\.\\d")) return None

      // startxref: the LAST occurrence in the tail window (§7.5.5)
      val tailStart = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailStart, bytes.length - tailStart,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val sIdx = tail.lastIndexOf("startxref")
      if (sIdx < 0) return None
      val doc = new Doc(bytes)
      doc.lex.p = tailStart + sIdx + 9
      val xrefOff = doc.lex.token().toLong
      doc.loadXref(xrefOff, Set.empty, 0)

      val trailer = doc.trailer
      val encrypted = trailer.m.contains("Encrypt")
      val catalog = trailer.m.get("Root").flatMap(doc.dictAt).getOrElse(return None)

      val nPages: Long = catalog.m.get("Pages").flatMap(doc.dictAt)
        .flatMap(_.m.get("Count")).flatMap(doc.numAt).getOrElse(-1L)

      val names = catalog.m.get("Names").flatMap(doc.dictAt)
      val jsNames = names.exists(_.m.contains("JavaScript"))
      val jsOpen = catalog.m.get("OpenAction").flatMap(doc.dictAt)
        .exists(_.m.get("S").contains(Name("JavaScript")))
      val attachments = names.exists(_.m.contains("EmbeddedFiles"))

      Some(Meta(version, nPages, encrypted, jsOpen || jsNames, attachments,
        doc.startKind, doc.incremental))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ======================================================== encoder
  // Deterministic fixture writer: REAL xref machinery in all three
  // wire forms (classic table, table + incremental update, xref stream
  // with optional PNG predictor and compressed-object streams), so the
  // walker's q60 gate exercises every parser path end to end.

  final case class EncodeSpec(
      versionMinor: Int, nPages: Int,
      encrypted: Boolean, jsOpenAction: Boolean, jsNames: Boolean,
      attachments: Boolean,
      form: String, // "table" | "incremental" | "stream" | "objstm"
      predictor: Boolean) // xref-stream forms: PNG Up predictor vs raw flate

  def encode(spec: EncodeSpec): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    def putB(b: Array[Byte]): Unit = out.write(b)

    val n = spec.nPages
    // object numbering: 1 catalog, 2 pages node, 3..2+n leaves, then
    // optionals in order: encrypt, objstm container, objstm length,
    // xref stream
    val encNum = if (spec.encrypted) Some(3 + n) else None
    var next = 3 + n + (if (spec.encrypted) 1 else 0)

    def catalogBody(withUpdateJs: Boolean): String = {
      val open =
        if (spec.jsOpenAction || withUpdateJs)
          " /OpenAction << /S /JavaScript /JS (app.alert(1)) >>"
        else ""
      val nameParts =
        (if (spec.jsNames)
          " /JavaScript << /Names [(n0) << /S /JavaScript /JS (x()) >>] >>"
        else "") +
          (if (spec.attachments)
            " /EmbeddedFiles << /Names [(a.txt) << /Type /Filespec /F (a.txt) >>] >>"
          else "")
      val names = if (nameParts.nonEmpty) s" /Names <<$nameParts >>" else ""
      s"<< /Type /Catalog /Pages 2 0 R$open$names >>"
    }
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    def pagesBody = s"<< /Type /Pages /Kids [$kids] /Count $n >>"

    var offsets = Map.empty[Int, Long]
    def writeObj(num: Int, body: String): Unit = {
      offsets = offsets.updated(num, out.size.toLong)
      put(s"$num 0 obj\n$body\nendobj\n")
    }

    put(s"%PDF-1.${spec.versionMinor}\n%âãÏÓ\n")

    val objStmForm = spec.form == "objstm"
    if (!objStmForm) {
      writeObj(1, catalogBody(withUpdateJs = false))
      writeObj(2, pagesBody)
    }
    (0 until n).foreach { i =>
      writeObj(3 + i,
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>")
    }
    encNum.foreach { e =>
      writeObj(e, "<< /Filter /Standard /V 1 /R 2 /O (o) /U (u) /P -44 >>")
    }

    var objStmNum = -1
    if (objStmForm) {
      // catalog + pages node packed into a compressed object stream,
      // with an INDIRECT /Length (the shape encrypting writers emit)
      objStmNum = next; next += 1
      val lenNum = next; next += 1
      val b1 = catalogBody(withUpdateJs = false)
      val b2 = pagesBody
      val header = s"1 0 2 ${b1.length + 1} "
      val first = header.length
      val payload = (header + b1 + "\n" + b2)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val deflated = deflate(payload)
      offsets = offsets.updated(objStmNum, out.size.toLong)
      put(s"$objStmNum 0 obj\n<< /Type /ObjStm /N 2 /First $first " +
        s"/Filter /FlateDecode /Length $lenNum 0 R >>\nstream\n")
      putB(deflated)
      put("\nendstream\nendobj\n")
      writeObj(lenNum, deflated.length.toString)
    }

    val trailerExtra =
      s" /Root 1 0 R${encNum.map(e => s" /Encrypt $e 0 R").getOrElse("")}"

    spec.form match {
      case "table" | "incremental" =>
        val size = next
        val xref1 = out.size.toLong
        put(s"xref\n0 $size\n")
        put("0000000000 65535 f \n")
        (1 until size).foreach { i =>
          put(f"${offsets(i)}%010d 00000 n \n")
        }
        put(s"trailer\n<< /Size $size$trailerExtra >>\nstartxref\n$xref1\n%%EOF\n")
        if (spec.form == "incremental") {
          // update: REPLACE the catalog with one that adds OpenAction JS —
          // newest-entry-wins is observable (hasJs flips true)
          val catOff = out.size.toLong
          put(s"1 0 obj\n${catalogBody(withUpdateJs = true)}\nendobj\n")
          val xref2 = out.size.toLong
          put(s"xref\n0 1\n0000000000 65535 f \n1 1\n")
          put(f"$catOff%010d 00000 n \n")
          put(s"trailer\n<< /Size $size$trailerExtra /Prev $xref1 >>\n" +
            s"startxref\n$xref2\n%%EOF\n")
        }
      case _ => // "stream" | "objstm": cross-reference STREAM
        val xrefNum = next; next += 1
        val size = next
        val xrefOff = out.size.toLong
        offsets = offsets.updated(xrefNum, xrefOff)
        // W = [1 2 1]: type, offset/objstm, gen/index
        val rowBytes = 4
        val rows = new java.io.ByteArrayOutputStream()
        def row(t: Int, a: Long, b: Int): Unit = {
          rows.write(t)
          rows.write(((a >> 8) & 0xff).toInt); rows.write((a & 0xff).toInt)
          rows.write(b)
        }
        row(0, 0, 255) // object 0: free
        (1 until size).foreach { i =>
          if (objStmForm && (i == 1 || i == 2)) row(2, objStmNum, i - 1)
          else row(1, offsets(i), 0)
        }
        val raw = rows.toByteArray
        val (data, parms) =
          if (spec.predictor) {
            // PNG Up predictor (tag 2), per-row delta against prior row
            val nRows = raw.length / rowBytes
            val pre = new java.io.ByteArrayOutputStream()
            var r = 0
            while (r < nRows) {
              pre.write(2)
              var i = 0
              while (i < rowBytes) {
                val up = if (r > 0) raw((r - 1) * rowBytes + i) & 0xff else 0
                pre.write(((raw(r * rowBytes + i) & 0xff) - up) & 0xff)
                i += 1
              }
              r += 1
            }
            (deflate(pre.toByteArray),
              " /DecodeParms << /Predictor 12 /Columns 4 >>")
          } else (deflate(raw), "")
        put(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 2 1]" +
          s" /Filter /FlateDecode$parms /Length ${data.length}$trailerExtra >>\nstream\n")
        putB(data)
        put("\nendstream\nendobj\n")
        put(s"startxref\n$xrefOff\n%%EOF\n")
    }
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }
}
