package graft.functions

import scala.collection.mutable.ListBuffer

/** ISO Base Media File Format (MP4/MOV) box-walk METADATA — brand,
  * movie duration, per-track codec fourcc, video dimensions, audio
  * rate/channels, sample counts — extracted by walking the public
  * ISO/IEC 14496-12 box grammar (size+fourcc headers, 64-bit
  * `largesize`, FullBox version/flags, the
  * `moov/mvhd + trak/tkhd + mdia/{mdhd,hdlr}/minf/stbl/{stsd,stts}`
  * tree) without decoding a single sample. MP4 is the web's dominant
  * video container; this is the ffprobe-shaped operation a training
  * pipeline runs at 100 TB — estimate hours of video, bucket by
  * codec/resolution, drop non-media — none of which needs the codec.
  * Sample DECODE (h264/hevc/vp9/av1, aac/opus) genuinely needs codec
  * libraries this container doesn't ship and stays with the
  * clearly-marked stubs; this module is the honest container half
  * (reference: the converter/codec plugin surface,
  * `src/converters/__init__.py:15-52`).
  *
  *  - box sizes are read as unsigned 64-bit where declared, every walk
  *    is bounded by the enclosing box AND a global box budget, so a
  *    hostile size field can neither overrun nor spin the walk
  *  - `size==1` → 64-bit largesize; `size==0` → box runs to the end of
  *    its container; `free`/`skip`/`wide`/`uuid` and unknown boxes skip
  *  - the file must LEAD with `ftyp` (leading `free`/`skip`/`wide`
  *    tolerated — QuickTime writers emit them) and carry a `moov`
  *
  * Malformed/truncated payloads classify (None), never throw. */
object Mp4 {

  /** One media track: `kind` from the hdlr handler ("video"/"audio"/
    * "other"), `codec` the first stsd sample-entry fourcc, dimensions
    * from the sample entry (video) or rate/channels from it (audio),
    * duration from mdhd in its OWN timescale converted to ms, and the
    * stts sample count. */
  final case class Track(
      kind: String, codec: String,
      width: Int, height: Int,
      sampleRate: Int, channels: Int,
      durationMs: Long, nSamples: Long)

  final case class Meta(brand: String, durationMs: Long, tracks: List[Track]) {
    def video: Option[Track] = tracks.find(_.kind == "video")
    def audio: Option[Track] = tracks.find(_.kind == "audio")
  }

  /** Global bound on boxes walked — a hostile payload full of 8-byte
    * boxes classifies in O(budget), not O(bytes). Real moov trees are
    * well under this. */
  private val MaxBoxes = 4096

  /** Cheap sniff: box 0 or 1 is `ftyp` (leading free/skip/wide
    * tolerated by the full walk; the sniff checks offset 4 only — the
    * dispatch use case is "is this plausibly ISO-BMFF"). */
  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private[functions] final class Walker(val b: Array[Byte]) {
    var budget: Int = MaxBoxes
    def u16(p: Long): Int = {
      val i = p.toInt
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    }
    def u32(p: Long): Long = {
      val i = p.toInt
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }
    def u64(p: Long): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Long): String = {
      val i = p.toInt
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    }
    /** Walk the child boxes of [start,end): f(type, payloadStart,
      * payloadEnd). Stops (without throwing) at the first malformed
      * header — a lying size can truncate the walk, never escape it. */
    def boxes(start: Long, end: Long)(f: (String, Long, Long) => Unit): Unit = {
      var p = start
      var ok = true
      while (ok && p + 8 <= end && budget > 0) {
        budget -= 1
        var size: Long = u32(p)
        val t = fourcc(p + 4)
        var pay = p + 8
        if (size == 1) {
          if (p + 16 > end) return
          size = u64(p + 8)
          pay = p + 16
        } else if (size == 0) size = end - p
        // size is unsigned; a value with the top bit set, smaller than
        // its own header, or past the container is malformed
        if (size < pay - p || size > end - p) ok = false
        else {
          f(t, pay, p + size)
          p += size
        }
      }
    }
  }

  /** Container metadata, or None when the payload is not ISO-BMFF.
    * Requires ftyp + moov + mvhd + ≥1 parseable track. */
  def videoMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (bytes == null || bytes.length < 16) return None
      val w = new Walker(bytes)
      var brand: String = null
      var movieDurMs = -1L
      val tracks = ListBuffer.empty[Track]
      var boxIdx = 0
      var sawNonFtyp = false
      w.boxes(0, bytes.length) { (t, s, e) =>
        boxIdx += 1
        t match {
          case "ftyp" if brand == null && !sawNonFtyp =>
            if (e - s >= 4) brand = w.fourcc(s)
          case "free" | "skip" | "wide" => () // tolerated anywhere, incl. pre-ftyp
          case "moov" if brand != null =>
            w.boxes(s, e) { (mt, ms, me) =>
              mt match {
                case "mvhd" if me - ms >= 20 =>
                  val ver = bytes(ms.toInt) & 0xff
                  val (ts, dur) =
                    if (ver == 1 && me - ms >= 32) (w.u32(ms + 20), w.u64(ms + 24))
                    else if (ver == 0) (w.u32(ms + 12), w.u32(ms + 16))
                    else (0L, 0L)
                  if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000)
                    movieDurMs = dur * 1000L / ts
                case "trak" => parseTrak(w, ms, me).foreach(tracks += _)
                case _ => ()
              }
            }
          case _ => sawNonFtyp = true // mdat/uuid/unknown: skipped
        }
      }
      if (brand == null || movieDurMs < 0 || tracks.isEmpty) None
      else Some(Meta(brand, movieDurMs, tracks.toList))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseTrak(w: Walker, start: Long, end: Long): Option[Track] = {
    var kind = "other"
    var codec: String = null
    var width = 0; var height = 0
    var rate = 0; var channels = 0
    var durMs = -1L
    var nSamples = -1L
    w.boxes(start, end) { (t, s, e) =>
      t match {
        case "mdia" =>
          w.boxes(s, e) { (mt, ms, me) =>
            mt match {
              case "mdhd" if me - ms >= 20 =>
                val ver = w.b(ms.toInt) & 0xff
                val (ts, dur) =
                  if (ver == 1 && me - ms >= 32) (w.u32(ms + 20), w.u64(ms + 24))
                  else if (ver == 0) (w.u32(ms + 12), w.u32(ms + 16))
                  else (0L, 0L)
                if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000)
                  durMs = dur * 1000L / ts
              case "hdlr" if me - ms >= 12 =>
                kind = w.fourcc(ms + 8) match {
                  case "vide" => "video"
                  case "soun" => "audio"
                  case _ => "other"
                }
              case "minf" =>
                w.boxes(ms, me) { (it, is, ie) =>
                  if (it == "stbl") w.boxes(is, ie) { (st, ss, se) =>
                    st match {
                      case "stsd" if se - ss >= 16 =>
                        // fullbox(4) + entry_count(4), then sample entries
                        // (each itself a box); the FIRST entry names the codec
                        w.boxes(ss + 8, se) { (et, es, ee) =>
                          if (codec == null) {
                            codec = et
                            // common sample-entry prefix: reserved(6) +
                            // data_reference_index(2) = 8 bytes
                            if (ee - es >= 28) {
                              // VisualSampleEntry: +16 predefined/reserved,
                              // then width/height u16 at +24/+26
                              width = w.u16(es + 24)
                              height = w.u16(es + 26)
                            }
                            if (ee - es >= 28) {
                              // AudioSampleEntry: version/revision/vendor(8),
                              // channelcount@+16, samplesize@+18,
                              // pre_defined/reserved(4), samplerate 16.16@+24
                              channels = w.u16(es + 16)
                              rate = (w.u32(es + 24) >> 16).toInt
                            }
                          }
                        }
                      case "stts" if se - ss >= 8 =>
                        val n = w.u32(ss + 4)
                        var total = 0L
                        var i = 0L
                        // each entry: sample_count(4) + sample_delta(4);
                        // bound by the box, not the declared count
                        while (i < n && ss + 8 + i * 8 + 8 <= se) {
                          total += w.u32(ss + 8 + i * 8)
                          i += 1
                        }
                        if (i == n) nSamples = total
                      case _ => ()
                    }
                  }
                }
              case _ => ()
            }
          }
        case _ => () // tkhd/edts/udta: not needed (dims come from stsd)
      }
    }
    if (codec == null || durMs < 0) None
    else Some(Track(
      kind, codec,
      width = if (kind == "video") width else 0,
      height = if (kind == "video") height else 0,
      sampleRate = if (kind == "audio") rate else 0,
      channels = if (kind == "audio") channels else 0,
      durationMs = durMs, nSamples = math.max(nSamples, 0L)))
  }

  // =====================================================================
  // Fixture-side encoder: a real, spec-layout ISO-BMFF writer (headers +
  // zeroed mdat — valid box trees with no decodable samples; the walk
  // never reads mdat). Exercises v0/v1 FullBoxes and 64-bit largesize.

  final case class VideoSpec(codec: String, w: Int, h: Int,
      nSamples: Int, delta: Int, timescale: Int)
  final case class AudioSpec(codec: String, rate: Int, channels: Int,
      nSamples: Int, delta: Int)

  private def be16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }
  private def be64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    be32(o, v >>> 32); be32(o, v & 0xffffffffL)
  }
  private def cc(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    require(s.length == 4, s"fourcc: $s")
    s.foreach(ch => o.write(ch.toInt & 0xff))
  }
  private def box(t: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    body(b)
    val payload = b.toByteArray
    val o = new java.io.ByteArrayOutputStream()
    be32(o, 8L + payload.length); cc(o, t); o.write(payload)
    o.toByteArray
  }

  /** Encode a minimal-but-real MP4: ftyp + moov(mvhd + trak per spec'd
    * stream) + trailing free + mdat (zeroed, optionally with 64-bit
    * largesize). Movie duration = max track duration re-expressed in
    * `movieTimescale`; `v1Boxes` writes version-1 mvhd/mdhd (64-bit
    * times). A `uuid` box is planted inside moov when `uuidInMoov` so
    * the walk's skip path stays exercised. */
  def encode(brand: String, movieTimescale: Int,
      video: Option[VideoSpec], audio: Option[AudioSpec],
      v1Boxes: Boolean = false, largesizeMdat: Boolean = false,
      uuidInMoov: Boolean = false, mdatLen: Int = 64): Array[Byte] = {
    require(movieTimescale > 0 && (video.nonEmpty || audio.nonEmpty))
    def trackDurMs(v: Option[VideoSpec], a: Option[AudioSpec]): Long = math.max(
      v.map(s => s.nSamples.toLong * s.delta * 1000L / s.timescale).getOrElse(0L),
      a.map(s => s.nSamples.toLong * s.delta * 1000L / s.rate).getOrElse(0L))
    val movieDur = trackDurMs(video, audio) * movieTimescale / 1000L

    def fullbox(t: String, ver: Int)(body: java.io.ByteArrayOutputStream => Unit) =
      box(t) { o => o.write(ver); o.write(0); o.write(0); o.write(0); body(o) }

    def mvhd = fullbox("mvhd", if (v1Boxes) 1 else 0) { o =>
      if (v1Boxes) { be64(o, 0); be64(o, 0); be32(o, movieTimescale); be64(o, movieDur) }
      else { be32(o, 0); be32(o, 0); be32(o, movieTimescale); be32(o, movieDur) }
      be32(o, 0x00010000L); be16(o, 0x0100); be16(o, 0) // rate, volume, reserved
      be32(o, 0); be32(o, 0)
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(be32(o, _)) // unity matrix
      (0 until 6).foreach(_ => be32(o, 0)) // pre_defined
      be32(o, 3) // next_track_ID
    }

    def stts(n: Int, delta: Int) = fullbox("stts", 0) { o =>
      be32(o, 1); be32(o, n); be32(o, delta)
    }

    def trak(trackId: Int, handler: String, name: String,
        mediaTs: Int, durUnits: Long,
        sampleEntry: Array[Byte], nSamples: Int, delta: Int): Array[Byte] =
      box("trak") { o =>
        o.write(fullbox("tkhd", 0) { t =>
          be32(t, 0); be32(t, 0); be32(t, trackId); be32(t, 0); be32(t, 0)
          be64(t, 0); be16(t, 0); be16(t, 0); be16(t, 0); be16(t, 0)
          Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
            .foreach(be32(t, _))
          be32(t, 0); be32(t, 0) // width/height 16.16 (authoritative dims live in stsd)
        })
        o.write(box("mdia") { m =>
          m.write(fullbox("mdhd", if (v1Boxes) 1 else 0) { d =>
            if (v1Boxes) { be64(d, 0); be64(d, 0); be32(d, mediaTs); be64(d, durUnits) }
            else { be32(d, 0); be32(d, 0); be32(d, mediaTs); be32(d, durUnits) }
            be16(d, 0x55c4); be16(d, 0) // language "und", pre_defined
          })
          m.write(fullbox("hdlr", 0) { d =>
            be32(d, 0); cc(d, handler); be32(d, 0); be32(d, 0); be32(d, 0)
            name.foreach(ch => d.write(ch.toInt)); d.write(0)
          })
          m.write(box("minf") { f =>
            f.write(box("stbl") { s =>
              s.write(fullbox("stsd", 0) { d => be32(d, 1); d.write(sampleEntry) })
              s.write(stts(nSamples, delta))
            })
          })
        })
      }

    def videoEntry(v: VideoSpec) = box(v.codec) { o =>
      (0 until 6).foreach(_ => o.write(0)); be16(o, 1) // reserved, data_ref_idx
      be16(o, 0); be16(o, 0); (0 until 3).foreach(_ => be32(o, 0)) // predefined
      be16(o, v.w); be16(o, v.h)
      be32(o, 0x00480000L); be32(o, 0x00480000L) // 72 dpi
      be32(o, 0); be16(o, 1) // reserved, frame_count
      (0 until 32).foreach(_ => o.write(0)) // compressorname
      be16(o, 24); be16(o, 0xffff) // depth, pre_defined=-1
    }
    def audioEntry(a: AudioSpec) = box(a.codec) { o =>
      (0 until 6).foreach(_ => o.write(0)); be16(o, 1)
      be16(o, 0); be16(o, 0); be32(o, 0) // version, revision, vendor
      be16(o, a.channels); be16(o, 16); be16(o, 0); be16(o, 0)
      be32(o, a.rate.toLong << 16) // 16.16
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(box("ftyp") { o => cc(o, brand); be32(o, 0); cc(o, brand); cc(o, "isom") })
    out.write(box("moov") { o =>
      o.write(mvhd)
      if (uuidInMoov) o.write(box("uuid") { u => (0 until 20).foreach(_ => u.write(0xab)) })
      video.foreach(v => o.write(trak(1, "vide", "VideoHandler",
        v.timescale, v.nSamples.toLong * v.delta, videoEntry(v), v.nSamples, v.delta)))
      audio.foreach(a => o.write(trak(2, "soun", "SoundHandler",
        a.rate, a.nSamples.toLong * a.delta, audioEntry(a), a.nSamples, a.delta)))
    })
    out.write(box("free") { o => (0 until 12).foreach(_ => o.write(0)) })
    if (largesizeMdat) {
      be32(out, 1); cc(out, "mdat"); be64(out, 16L + mdatLen)
      (0 until mdatLen).foreach(_ => out.write(0))
    } else {
      be32(out, 8L + mdatLen); cc(out, "mdat")
      (0 until mdatLen).foreach(_ => out.write(0))
    }
    out.toByteArray
  }
}
