package graft.functions

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** TAR (POSIX ustar + the GNU longname extension) reader/writer — the
  * container WebDataset ships multimodal training shards in: a tar of
  * `{key}.jpg` + `{key}.txt` (+ `{key}.json`, …) entries per sample,
  * read sequentially by data loaders. A crawl pipeline that produces
  * image+caption rows hands them to training as exactly these shards,
  * so the engine owns both directions.
  *
  * Grammar walked (all public: POSIX.1-1988/2001 ustar, GNU tar docs):
  * 512-byte header blocks — name[100] mode[8] uid[8] gid[8] size[12]
  * mtime[12] chksum[8] typeflag name-cont'd magic `ustar` — octal
  * sizes (with the base-256 binary extension for >8 GiB entries),
  * checksum verified (unsigned sum with the chksum field as spaces),
  * data rounded up to 512-byte blocks, two zero blocks as terminator
  * (trailing-garbage tolerant readers stop at the first zero block,
  * like GNU tar). Extensions: ustar `prefix[155]` path joining,
  * GNU `L` longname records, pax `x`/`g` extended headers (the
  * `path=` override is honored; other keywords skipped). Directories,
  * links, and device nodes carry no data and are skipped as samples.
  *
  * Like every walker in this package the parse is bounded and NEVER
  * throws — truncated/lying/corrupt archives classify as `None`. */
object Tar {

  val MaxEntries = 100000
  val MaxEntryBytes: Long = 1L << 30

  final case class Entry(name: String, bytes: Array[Byte], typeflag: Char)

  def isTar(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 512 &&
      bytes(257) == 'u' && bytes(258) == 's' && bytes(259) == 't' &&
      bytes(260) == 'a' && bytes(261) == 'r'

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    // base-256 extension: high bit of the first byte set
    if ((b(off) & 0x80) != 0) {
      var v = (b(off) & 0x7fL)
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      return v
    }
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (v << 3) + (b(i) - '0')
      i += 1
    }
    v
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val cap = off + len
    while (end < cap && b(end) != 0) end += 1
    new String(b, off, end - off, UTF_8)
  }

  private def checksumOk(b: Array[Byte], off: Int): Boolean = {
    val want = octal(b, off + 148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toLong else (b(off + i) & 0xffL))
      i += 1
    }
    sum == want
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < 512) { if (b(off + i) != 0) return false; i += 1 }
    true
  }

  /** Parse every regular-file entry. None on any grammar violation. */
  def entries(bytes: Array[Byte]): Option[Vector[Entry]] =
    try {
      if (bytes == null || bytes.length < 512) return None
      var pos = 0
      var n = 0
      var sawAny = false
      var pendingLongName: String = null
      var pendingPaxPath: String = null
      // pax 'g' (global) keywords apply to ALL subsequent entries until a
      // later 'g' overrides them (POSIX.1-2001 pax semantics) — unlike the
      // one-shot per-file 'x' header
      var globalPaxPath: String = null
      val out = Vector.newBuilder[Entry]
      while (pos + 512 <= bytes.length) {
        if (isZeroBlock(bytes, pos)) {
          // end-of-archive marker; GNU readers stop here
          return if (sawAny) Some(out.result()) else None
        }
        if (n >= MaxEntries) return None
        if (!checksumOk(bytes, pos)) return None
        val size = octal(bytes, pos + 124, 12)
        if (size < 0 || size > MaxEntryBytes) return None
        val dataEnd = pos + 512 + size
        if (dataEnd > bytes.length) return None // lying size / truncation
        val typeflag = (bytes(pos + 156) & 0xff).toChar
        val rawName = {
          val base = cstr(bytes, pos, 100)
          val prefix = cstr(bytes, pos + 345, 155)
          if (prefix.nonEmpty) prefix + "/" + base else base
        }
        val data = java.util.Arrays.copyOfRange(bytes, pos + 512, dataEnd.toInt)
        typeflag match {
          case 'L' => // GNU longname: data IS the next entry's name
            pendingLongName = cstr(data, 0, data.length)
          case 'x' => // pax per-file header: honor path= for the NEXT entry
            paxPath(data).foreach(p => pendingPaxPath = p)
          case 'g' => // pax GLOBAL header: path= persists across entries
            paxPath(data).foreach(p => globalPaxPath = p)
          case c if c == '0' || c.toInt == 0 => // pre-POSIX tar wrote NUL for regular files
            val name = // per-file overrides beat the persistent global
              if (pendingPaxPath != null) pendingPaxPath
              else if (pendingLongName != null) pendingLongName
              else if (globalPaxPath != null) globalPaxPath
              else rawName
            if (name.isEmpty) return None
            out += Entry(name, data, '0')
            pendingLongName = null; pendingPaxPath = null
            sawAny = true
          case _ => // dir/link/device/fifo: no sample data
            pendingLongName = null; pendingPaxPath = null
            sawAny = true
        }
        val padded = ((dataEnd + 511L) / 512L) * 512L
        // a final entry unpadded to the block boundary ends the archive
        pos = if (padded > bytes.length) bytes.length else padded.toInt
        n += 1
      }
      // archives without the two-zero-block tail are common in the wild;
      // accept a clean end-of-buffer
      if (sawAny) Some(out.result()) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** `len key=value\n` records; returns the `path` override if present. */
  private def paxPath(data: Array[Byte]): Option[String] = {
    var pos = 0
    var found: Option[String] = None
    var guard = 0
    while (pos < data.length && guard < 1000) {
      var sp = pos
      while (sp < data.length && data(sp) != ' ') sp += 1
      if (sp >= data.length) return found
      val len = new String(data, pos, sp - pos, US_ASCII).toIntOption.getOrElse(return found)
      if (len <= 0 || pos + len > data.length) return found
      val rec = new String(data, sp + 1, pos + len - sp - 2, UTF_8) // drop \n
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path")
        found = Some(rec.substring(eq + 1))
      pos += len
      guard += 1
    }
    found
  }

  /** Serialize regular-file entries as ustar with fixed mtime 0 —
    * identical input always produces identical bytes (idempotent task
    * retries). Names >100 chars emit a GNU `L` longname record. */
  def encode(items: Vector[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    items.foreach { case (name, data) => writeEntryTo(out, name, data) }
    writeTrailerTo(out)
    out.toByteArray
  }

  /** Stream ONE entry to `out` — the unit [[encode]] loops over, exposed
    * so the WebDataset sink can write entry-at-a-time to a Hadoop
    * FSDataOutputStream without buffering a whole partition (guide §5).
    * Byte-identical to [[encode]] by construction: [[encode]] delegates
    * here. Callers finish the archive with [[writeTrailerTo]]. */
  def writeEntryTo(out: java.io.OutputStream, name: String,
      data: Array[Byte]): Unit = {
    val nameB = name.getBytes(UTF_8)
    if (nameB.length > 100) {
      // GNU longname: an 'L' record whose data is the NUL-terminated name
      writeHeader(out, "././@LongLink", nameB.length + 1, 'L')
      out.write(nameB); out.write(0)
      pad(out, nameB.length + 1)
    }
    writeHeader(out, name, data.length, '0') // >100-byte names truncate here; the L record carries the truth
    out.write(data)
    pad(out, data.length)
  }

  /** The two terminating zero blocks every tar ends with. */
  def writeTrailerTo(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](1024))

  private def pad(out: java.io.OutputStream, n: Int): Unit = {
    val rem = n % 512
    if (rem != 0) out.write(new Array[Byte](512 - rem))
  }

  private def writeHeader(out: java.io.OutputStream, name: String,
      size: Int, typeflag: Char): Unit = {
    val h = new Array[Byte](512)
    val nameB = name.getBytes(UTF_8)
    System.arraycopy(nameB, 0, h, 0, math.min(nameB.length, 100))
    putOctal(h, 100, 8, 420) // 0644
    putOctal(h, 108, 8, 0)
    putOctal(h, 116, 8, 0)
    putOctal(h, 124, 12, size.toLong)
    putOctal(h, 136, 12, 0) // mtime 0: reproducible
    h(156) = typeflag.toByte
    "ustar".getBytes(US_ASCII).copyToArray(h, 257)
    h(263) = '0'; h(264) = '0' // version "00"
    // checksum: spaces while summing, then "%06o\0 "
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += (h(i) & 0xffL); i += 1 }
    val cs = "%06o".format(sum).getBytes(US_ASCII)
    System.arraycopy(cs, 0, h, 148, 6)
    h(154) = 0; h(155) = ' ' // the historical NUL-then-space form GNU writes
    out.write(h)
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = ("%0" + (len - 1) + "o").format(v)
    val b = s.getBytes(US_ASCII)
    System.arraycopy(b, 0, h, off, math.min(b.length, len - 1))
  }
}
