package graft.functions

/** HEIF/AVIF image METADATA — brand, primary-item codec, pixel
  * dimensions, rotation, item census, embedded-EXIF flag — extracted by
  * walking the public ISO/IEC 23008-12 item grammar over the same
  * ISO/IEC 14496-12 box layer [[Mp4]] already walks: `ftyp` +
  * `meta(hdlr/pitm/iinf(infe*)/iprp(ipco+ipma))`. AVIF/HEIC are
  * ISO-BMFF files that are IMAGES, not movies — a content-sniffed
  * triage (see [[MediaMeta]]) must split them from MP4 video by brand
  * before the movie walk, or every modern iPhone photo and AV1 still
  * classifies as a broken video. Dimensions come from the `ispe`
  * property ASSOCIATED with the primary item via `ipma` (1-based
  * indices into `ipco`'s ordered children), not from any track header;
  * rotation from `irot`; `has_exif` (an `Exif` item present) is the
  * PII-scrub signal, same role as [[Jpeg.ExifMeta]]'s `hasGps`.
  * Payload DECODE (av01/hvc1 stills) genuinely needs codec libraries
  * this container doesn't ship and stays with the clearly-marked stubs
  * (reference: the converter/codec plugin surface,
  * `src/converters/__init__.py:15-52`); this is the honest container
  * half.
  *
  * Malformed/truncated payloads classify (None), never throw. */
object Heif {

  final case class Meta(
      brand: String, // ftyp major brand: avif | heic | ...
      codec: String, // primary item's infe type: av01 | hvc1 | ...
      width: Int, height: Int, // ispe of the primary item
      rotationDeg: Int, // irot × 90; 0 when absent
      nItems: Int, // infe census (incl. Exif/alpha items)
      hasExif: Boolean)

  /** Image-sequence/still brands from the HEIF/AVIF registrations. A
    * file whose MAJOR brand is one of these is an image payload even
    * though the container is ISO-BMFF. */
  private val ImageBrands =
    Set("avif", "avis", "heic", "heix", "hevc", "hevx", "mif1", "msf1")

  def isHeif(b: Array[Byte]): Boolean =
    Mp4.isMp4(b) && b.length >= 12 && {
      val brand = new String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
      ImageBrands.contains(brand)
    }

  /** Item metadata, or None when not a parseable HEIF/AVIF image.
    * Requires an image-brand ftyp + meta + pitm + the primary item's
    * infe and an associated ispe with positive dims. */
  def imageMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isHeif(bytes)) return None
      val w = new Mp4.Walker(bytes)
      var brand: String = null
      var primaryId = -1L
      var codec: String = null
      var width = 0; var height = 0
      var rotation = 0
      var nItems = 0
      var hasExif = false
      // ipco children in declaration order (1-based ipma indices)
      val props = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      // primary item's association indices, filled from ipma
      var primaryProps: List[Int] = Nil
      // infe item_id -> item_type
      val itemTypes = scala.collection.mutable.Map.empty[Long, String]

      w.boxes(0, bytes.length) { (t, s, e) =>
        t match {
          case "ftyp" if brand == null =>
            if (e - s >= 4) brand = w.fourcc(s)
          case "meta" if brand != null && e - s >= 4 =>
            // meta is a FullBox: 4 bytes version/flags then children
            w.boxes(s + 4, e) { (mt, ms, me) =>
              mt match {
                case "pitm" if me - ms >= 6 =>
                  val ver = bytes(ms.toInt) & 0xff
                  primaryId =
                    if (ver == 0) w.u16(ms + 4).toLong
                    else if (me - ms >= 8) w.u32(ms + 4)
                    else -1L
                case "iinf" if me - ms >= 6 =>
                  val ver = bytes(ms.toInt) & 0xff
                  val childStart = if (ver == 0) ms + 6 else ms + 8
                  if (childStart <= me) w.boxes(childStart, me) { (it, is, ie) =>
                    if (it == "infe" && ie - is >= 12) {
                      val iv = bytes(is.toInt) & 0xff
                      // v2: item_ID u16 @+4, protection u16, type @+8
                      // v3: item_ID u32 @+4, protection u16, type @+10
                      val (id, tOff) =
                        if (iv == 2) (w.u16(is + 4).toLong, is + 8)
                        else if (iv == 3 && ie - is >= 14) (w.u32(is + 4), is + 10)
                        else (-1L, is)
                      if (id >= 0 && tOff + 4 <= ie) {
                        val ty = w.fourcc(tOff)
                        itemTypes(id) = ty
                        nItems += 1
                        if (ty == "Exif") hasExif = true
                      }
                    }
                  }
                case "iprp" =>
                  w.boxes(ms, me) { (pt, ps, pe) =>
                    pt match {
                      case "ipco" =>
                        w.boxes(ps, pe)((ct, cs, ce) => props += ((ct, cs, ce)))
                      case "ipma" if pe - ps >= 8 =>
                        val ver = bytes(ps.toInt) & 0xff
                        val wide = (w.u32(ps) & 1L) != 0 // flags bit 0: 15-bit index
                        val n = w.u32(ps + 4)
                        var p = ps + 8
                        var i = 0L
                        while (i < n && p < pe) {
                          val id =
                            if (ver == 0 && p + 2 <= pe) { val v = w.u16(p).toLong; p += 2; v }
                            else if (ver >= 1 && p + 4 <= pe) { val v = w.u32(p); p += 4; v }
                            else { p = pe; -1L }
                          if (id >= 0 && p + 1 <= pe) {
                            val cnt = bytes(p.toInt) & 0xff
                            p += 1
                            val idx = scala.collection.mutable.ListBuffer.empty[Int]
                            var j = 0
                            while (j < cnt && p < pe) {
                              if (wide && p + 2 <= pe) { idx += (w.u16(p) & 0x7fff); p += 2 }
                              else { idx += (bytes(p.toInt) & 0x7f); p += 1 }
                              j += 1
                            }
                            if (id == primaryId) primaryProps = idx.toList
                          }
                          i += 1
                        }
                      case _ => ()
                    }
                  }
                case _ => () // hdlr/iloc/iref/free: the walk never reads items
              }
            }
          case _ => () // mdat/free/unknown
        }
      }

      if (brand == null || primaryId < 0) return None
      codec = itemTypes.getOrElse(primaryId, null)
      if (codec == null) return None
      // resolve the primary item's associated properties (1-based)
      primaryProps.foreach { i =>
        if (i >= 1 && i <= props.length) props(i - 1) match {
          case ("ispe", ps, pe) if pe - ps >= 12 =>
            // FullBox(4) + image_width u32 + image_height u32
            width = w.u32(ps + 4).toInt
            height = w.u32(ps + 8).toInt
          case ("irot", ps, pe) if pe - ps >= 1 =>
            rotation = (bytes(ps.toInt) & 3) * 90
          case _ => ()
        }
      }
      if (width <= 0 || height <= 0) None
      else Some(Meta(brand, codec, width, height, rotation, nItems, hasExif))
    } catch { case scala.util.control.NonFatal(_) => None }

  // =====================================================================
  // Fixture-side encoder: a real, spec-layout HEIF/AVIF item tree
  // (headers + zeroed mdat — the metadata walk never reads item
  // payloads, and still DECODE is exactly what stays honestly stubbed).

  private def be16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }
  private def box(t: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    body(b)
    val payload = b.toByteArray
    val o = new java.io.ByteArrayOutputStream()
    be32(o, payload.length + 8L)
    o.write(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    o.write(payload)
    o.toByteArray
  }
  private def fullbox(t: String, ver: Int, flags: Int = 0)(
      body: java.io.ByteArrayOutputStream => Unit): Array[Byte] =
    box(t) { o => o.write(ver); o.write((flags >> 16) & 0xff)
      o.write((flags >> 8) & 0xff); o.write(flags & 0xff); body(o) }

  /** Encode a minimal-but-real HEIF/AVIF still: ftyp + meta(hdlr +
    * pitm + iinf + iprp(ipco[ispe, irot, free] + ipma)) + mdat
    * (zeroed). `v1Pitm` writes the 32-bit pitm form; `wideIpma` sets
    * ipma flags bit 0 (15-bit property indices); `withExif` adds a
    * second infe item of type Exif. The free box inside ipco keeps a
    * 1-based-index off-by-one honest: irot sits at index 3, not 2. */
  def encode(brand: String, codec: String, w: Int, h: Int,
      rotationQuarter: Int, withExif: Boolean,
      v1Pitm: Boolean = false, wideIpma: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && rotationQuarter >= 0 && rotationQuarter < 4)
    val ftyp = box("ftyp") { o =>
      o.write(brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      be32(o, 0)
      o.write(brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write("mif1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    val hdlr = fullbox("hdlr", 0) { o =>
      be32(o, 0)
      o.write("pict".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      be32(o, 0); be32(o, 0); be32(o, 0)
      o.write(0) // empty name
    }
    val pitm =
      if (v1Pitm) fullbox("pitm", 1)(o => be32(o, 1L))
      else fullbox("pitm", 0)(o => be16(o, 1))
    def infe(id: Int, ty: String) = fullbox("infe", 2) { o =>
      be16(o, id); be16(o, 0)
      o.write(ty.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write(0) // empty name
    }
    val items = Seq(infe(1, codec)) ++ (if (withExif) Seq(infe(2, "Exif")) else Nil)
    val iinf = fullbox("iinf", 0) { o =>
      be16(o, items.length)
      items.foreach(o.write)
    }
    val ispe = fullbox("ispe", 0) { o => be32(o, w); be32(o, h) }
    val irot = box("irot")(o => o.write(rotationQuarter))
    val pad = box("free")(o => be32(o, 0)) // index-2 decoy: irot is index 3
    val ipco = box("ipco") { o => o.write(ispe); o.write(pad); o.write(irot) }
    val ipma = fullbox("ipma", 0, if (wideIpma) 1 else 0) { o =>
      be32(o, 1)
      be16(o, 1) // item 1
      o.write(2) // two associations: ispe (1), irot (3)
      if (wideIpma) { be16(o, 0x8000 | 1); be16(o, 0x8000 | 3) }
      else { o.write(0x80 | 1); o.write(0x80 | 3) }
    }
    val iprp = box("iprp") { o => o.write(ipco); o.write(ipma) }
    val meta = fullbox("meta", 0) { o =>
      o.write(hdlr); o.write(pitm); o.write(iinf); o.write(iprp)
    }
    val mdat = box("mdat")(o => o.write(new Array[Byte](32)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(meta); out.write(mdat)
    out.toByteArray
  }
}
