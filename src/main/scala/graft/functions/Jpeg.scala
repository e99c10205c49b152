package graft.functions

/** JPEG marker-segment walk + EXIF (TIFF IFD) METADATA — frame
  * dimensions and progressive-ness from the SOF marker, orientation /
  * camera make+model / capture timestamp / ISO / Exif pixel dims from
  * the APP1 "Exif" payload, and a `hasGps` flag (GPS IFD present) — the
  * PII-scrub signal a training-data pipeline needs before publishing
  * crawled images. All from the public grammars: JPEG's FF-marker
  * segment stream (ITU T.81 §B) and the TIFF 6.0 IFD layout EXIF rides
  * (byte-order II/MM, 12-byte entries, inline-vs-offset values, the
  * 0x8769 Exif and 0x8825 GPS sub-IFD pointers). Pixel DECODE stays
  * with the JDK codec ([[ImageOps]]) — this module is the metadata
  * sidecar the codec ignores.
  *
  *  - both byte orders; SHORT and LONG accepted where EXIF allows either
  *  - values ≤4 bytes are inline (endian-correct), longer ones at
  *    offsets — every read bounds-checked against the APP1 payload
  *  - IFD entry counts and the IFD chain are budget-bounded, so a
  *    hostile payload can neither overrun nor spin the walk
  *
  * Malformed/truncated payloads classify (None), never throw. */
object Jpeg {

  final case class ExifMeta(
      width: Int, height: Int, // from SOF — the decoder-authoritative dims
      progressive: Boolean, // SOF2 vs SOF0/1
      orientation: Int, // 0 when absent
      make: String, model: String, dateTime: String, // "" when absent
      exifWidth: Long, exifHeight: Long, // PixelX/YDimension, -1 absent
      iso: Long, // -1 when absent
      hasGps: Boolean)

  private val MaxIfdEntries = 512
  private val MaxIfds = 8

  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** SOF + EXIF metadata, or None when the payload is not a JPEG. */
  def exifMeta(bytes: Array[Byte]): Option[ExifMeta] =
    try {
      if (!isJpeg(bytes)) return None
      var p = 2
      var w = -1; var h = -1; var progressive = false
      var tiff: (Int, Int) = null // (offset, length) of the TIFF body in APP1
      var done = false
      while (!done && p + 4 <= bytes.length) {
        if ((bytes(p) & 0xff) != 0xff) return None // marker desync
        val marker = bytes(p + 1) & 0xff
        if (marker == 0xff) {
          p += 1 // T.81 §B.1.1.2 fill byte before a marker
        } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          p += 2 // standalone markers carry no length
        } else if (marker == 0xd9 || marker == 0xda) {
          done = true // EOI / start-of-scan: entropy data follows, stop
        } else {
          val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          if (len < 2 || p + 2 + len > bytes.length) return None
          val seg = p + 4
          val segLen = len - 2
          marker match {
            case 0xc0 | 0xc1 | 0xc2 if segLen >= 5 =>
              progressive = marker == 0xc2
              h = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
              w = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
            case 0xe1 if segLen >= 14 && tiff == null &&
                bytes(seg) == 'E' && bytes(seg + 1) == 'x' && bytes(seg + 2) == 'i' &&
                bytes(seg + 3) == 'f' && bytes(seg + 4) == 0 && bytes(seg + 5) == 0 =>
              tiff = (seg + 6, segLen - 6)
            case _ => ()
          }
          p += 2 + len
        }
      }
      if (w <= 0 || h <= 0) return None
      var orientation = 0
      var make = ""; var model = ""; var dateTime = ""
      var exifW = -1L; var exifH = -1L; var iso = -1L
      var hasGps = false
      if (tiff != null) parseTiff(bytes, tiff._1, tiff._2).foreach { t =>
        orientation = t.orientation; make = t.make; model = t.model
        dateTime = t.dateTime; exifW = t.exifW; exifH = t.exifH
        iso = t.iso; hasGps = t.hasGps
      }
      Some(ExifMeta(w, h, progressive, orientation, make, model, dateTime,
        exifW, exifH, iso, hasGps))
    } catch { case scala.util.control.NonFatal(_) => None }

  private final case class TiffMeta(
      orientation: Int, make: String, model: String, dateTime: String,
      exifW: Long, exifH: Long, iso: Long, hasGps: Boolean)

  /** Parse the TIFF body of an EXIF APP1: header at `base`, all IFD
    * offsets relative to `base`, every access bounded by `len`. */
  private def parseTiff(b: Array[Byte], base: Int, len: Int): Option[TiffMeta] = {
    if (len < 8) return None
    val le = (b(base) & 0xff, b(base + 1) & 0xff) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => return None
    }
    def u16(off: Long): Int = {
      if (off < 0 || off + 2 > len) return -1
      val i = base + off.toInt
      if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    }
    def u32(off: Long): Long = {
      if (off < 0 || off + 4 > len) return -1L
      val i = base + off.toInt
      if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }
    if (u16(2) != 42) return None
    var orientation = 0
    var make = ""; var model = ""; var dateTime = ""
    var exifW = -1L; var exifH = -1L; var iso = -1L
    var hasGps = false
    var exifIfd = -1L; var gpsIfd = -1L
    var ifdBudget = MaxIfds

    def asciiAt(count: Long, valOff: Long): String = {
      // ASCII: count bytes incl. NUL; ≤4 inline at the value slot, else
      // at the pointed-to offset
      val src = if (count <= 4) valOff else u32(valOff)
      if (src < 0 || count <= 0 || count > 4096 || src + count > len) return ""
      val n0 = (count - 1).toInt // strip the NUL
      var n = n0
      while (n > 0 && b(base + src.toInt + n - 1) == 0) n -= 1
      new String(b, base + src.toInt, n, java.nio.charset.StandardCharsets.US_ASCII)
    }
    def scalarAt(typ: Int, valOff: Long): Long = typ match {
      case 3 => u16(valOff).toLong // SHORT: first value sits inline
      case 4 => u32(valOff) // LONG
      case _ => -1L
    }

    def walkIfd(off0: Long, kind: Int): Unit = { // kind 0=IFD0, 1=Exif, 2=GPS
      if (off0 < 0 || ifdBudget <= 0) return
      ifdBudget -= 1
      val n = u16(off0)
      if (n < 0 || n > MaxIfdEntries) return
      var i = 0
      while (i < n) {
        val e = off0 + 2 + i * 12L
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        val valOff = e + 8
        if (tag >= 0 && count >= 0) (kind, tag) match {
          case (0, 0x0112) => orientation = math.max(0, scalarAt(typ, valOff).toInt)
          case (0, 0x010f) => make = asciiAt(count, valOff)
          case (0, 0x0110) => model = asciiAt(count, valOff)
          case (0, 0x0132) => dateTime = asciiAt(count, valOff)
          case (0, 0x8769) => exifIfd = u32(valOff)
          case (0, 0x8825) => gpsIfd = u32(valOff)
          case (1, 0xa002) => exifW = scalarAt(typ, valOff)
          case (1, 0xa003) => exifH = scalarAt(typ, valOff)
          case (1, 0x8827) => iso = scalarAt(typ, valOff)
          case _ => ()
        }
        i += 1
      }
    }
    walkIfd(u32(4), 0)
    if (exifIfd >= 0) walkIfd(exifIfd, 1)
    if (gpsIfd >= 0) { // presence of a parseable GPS IFD is the signal
      val n = u16(gpsIfd)
      hasGps = n > 0 && n <= MaxIfdEntries
    }
    Some(TiffMeta(orientation, make, model, dateTime, exifW, exifH, iso, hasGps))
  }

  // =====================================================================
  // Fixture-side EXIF writer: builds a real APP1 TIFF payload (either
  // byte order) and splices it after SOI of a real JPEG — the decoder
  // walk then reads dims from the JDK-encoded SOF and the rest from here.

  final case class ExifSpec(
      orientation: Int, make: String, model: String, dateTime: String,
      exifW: Int, exifH: Int, iso: Int, gps: Boolean, littleEndian: Boolean)

  /** Serialize one IFD entry list + its out-of-line data. Layout:
    * header(8) IFD0 [Exif IFD] [GPS IFD] [string data]. */
  def buildExifApp1(s: ExifSpec): Array[Byte] = {
    val le = s.littleEndian
    val o = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      else { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt) }
      else { o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
        o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt) }

    // plan offsets (all relative to the TIFF header start)
    val makeB = s.make.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    val modelB = s.model.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    val dateB = s.dateTime.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    val n0 = 6 // orientation, make, model, datetime, exif ptr, (gps ptr)
    val ifd0Entries = if (s.gps) n0 else n0 - 1
    val ifd0At = 8L
    val exifAt = ifd0At + 2 + ifd0Entries * 12 + 4
    val exifEntries = 3 // pixelX, pixelY, iso
    val gpsAt = exifAt + 2 + exifEntries * 12 + 4
    val gpsEntries = 1 // GPSVersionID
    val dataAt = if (s.gps) gpsAt + 2 + gpsEntries * 12 + 4
      else gpsAt // no GPS IFD: strings start where it would have
    val makeAt = dataAt
    val modelAt = makeAt + makeB.length
    val dateAt = modelAt + modelB.length

    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count)
      typ match {
        case 3 => w16(value.toInt); w16(0) // SHORT inline, padded
        case _ => w32(value)
      }
    }
    def asciiEntry(tag: Int, data: Array[Byte], at: Long): Unit =
      if (data.length <= 4) {
        // TIFF 6.0: values that fit must live IN the value slot,
        // left-justified raw bytes (no endian swap for ASCII)
        w16(tag); w16(2); w32(data.length.toLong)
        data.foreach(v => o.write(v & 0xff))
        (data.length until 4).foreach(_ => o.write(0))
      } else entry(tag, 2, data.length.toLong, at)

    // header
    if (le) { o.write('I'); o.write('I') } else { o.write('M'); o.write('M') }
    w16(42); w32(ifd0At)
    // IFD0 (tags ascending per spec)
    w16(ifd0Entries)
    asciiEntry(0x010f, makeB, makeAt)
    asciiEntry(0x0110, modelB, modelAt)
    entry(0x0112, 3, 1, s.orientation.toLong)
    asciiEntry(0x0132, dateB, dateAt)
    entry(0x8769, 4, 1, exifAt)
    if (s.gps) entry(0x8825, 4, 1, gpsAt)
    w32(0) // next-IFD terminator
    // Exif IFD
    w16(exifEntries)
    entry(0x8827, 3, 1, s.iso.toLong)
    entry(0xa002, 4, 1, s.exifW.toLong)
    entry(0xa003, 3, 1, s.exifH.toLong)
    w32(0)
    // GPS IFD
    if (s.gps) {
      w16(gpsEntries)
      entry(0x0000, 1, 4, 0x02020000L) // GPSVersionID 2.2.0.0 (BYTE×4 inline)
      w32(0)
    }
    // string data
    o.write(makeB); o.write(modelB); o.write(dateB)
    val tiffBody = o.toByteArray
    require(makeAt == dataAt && dateAt + dateB.length == tiffBody.length)

    val app1 = new java.io.ByteArrayOutputStream()
    app1.write(0xff); app1.write(0xe1)
    val len = 2 + 6 + tiffBody.length
    app1.write((len >> 8) & 0xff); app1.write(len & 0xff)
    app1.write('E'); app1.write('x'); app1.write('i'); app1.write('f')
    app1.write(0); app1.write(0)
    app1.write(tiffBody)
    app1.toByteArray
  }

  /** Splice an APP1 right after SOI of an existing JPEG. */
  def injectExif(jpeg: Array[Byte], s: ExifSpec): Array[Byte] = {
    require(isJpeg(jpeg), "not a JPEG")
    val app1 = buildExifApp1(s)
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }
}
