package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.ImageOps

/** Deterministic synthetic-web + image/caption fixtures (FIXTURES.md).
  * Everything is a pure function of (params, indices) — fixed seed, no wall
  * clock, no network — so the Spark generators and the pure-Scala reference
  * simulator (graft.sim.ReferenceSim) see the *same* world.
  *
  * Models the reference's test inputs: page/link shapes from
  * `tests/conftest.py:18-75` + BFS semantics `src/crawler/discovery.py:131-230`;
  * noise links from `discovery.py:110-114`; blocked pages from
  * `src/scraper/detection.py:10-21`; plus the image+caption payload mandated
  * by `BASELINE.json.input_hint`.
  */
object FixtureGen {

  final case class Params(
      hosts: Int = 3,
      pagesPerHost: Int = 60,
      /** host 0 gets `skew ×` pages — the deliberately skewed domain. */
      skew: Int = 4,
      branching: Int = 3)

  def hostName(h: Int): String = s"site-$h.test"
  def seedUrl(h: Int): String = s"https://${hostName(h)}/docs"
  def pageCount(p: Params, h: Int): Int =
    if (h == 0) p.pagesPerHost * p.skew else p.pagesPerHost

  def hostOffsets(p: Params): Array[Long] = {
    val off = new Array[Long](p.hosts + 1)
    var acc = 0L
    (0 until p.hosts).foreach { h => off(h) = acc; acc += pageCount(p, h) }
    off(p.hosts) = acc
    off
  }
  def totalPages(p: Params): Long = hostOffsets(p)(p.hosts)
  def totalImages(p: Params): Long = 2L * totalPages(p)

  // ---- page classes (deterministic by page index j) ----
  // j%31 == 11 → 404;  == 13 → non-HTML;  == 17 → blocked content;
  // == 19 → duplicate content of j-1;  == 23 → robots-disallowed /private/;
  // == 3 → /es/ path (language-filtered);  == 5 → /blog/ (pattern-filtered);
  // == 7 → .pdf (extension-filtered)

  def pagePath(j: Int): String =
    if (j == 0) "/docs"
    else (j % 31) match {
      case 3  => s"/docs/es/p$j"
      case 5  => s"/docs/blog/p$j"
      case 7  => s"/docs/f$j.pdf"
      case 23 => s"/docs/private/p$j"
      case _  => s"/docs/p$j"
    }

  def pageUrl(h: Int, j: Int): String = s"https://${hostName(h)}${pagePath(j)}"

  final case class Page(
      url: String,
      status: Int,
      contentType: String,
      content: String,
      links: Seq[String],
      navLinks: Seq[String],
      imageRefs: Seq[String],
      fetchMethod: String,
      loadMs: Long)

  /** Cascade strategy assignment: every third host (offset 1) exposes nav
    * links on its seed page; hasSitemap hosts publish sitemaps; the rest
    * fall through to BFS — all three reference strategies exercised. */
  def hasNav(h: Int): Boolean = h % 3 == 1

  def imageId(n: Long): String = f"img-$n%08d"

  /** The synthetic page for (host h, page j). */
  def page(p: Params, h: Int, j: Int): Page = {
    val url = pageUrl(h, j)
    val n = pageCount(p, h)
    val status = if (j % 31 == 11) 404 else 200
    val contentType = if (j % 31 == 13) "application/pdf" else "text/html"
    val content = (j % 31) match {
      case 17 => s"Just a moment... checking your browser. Cloudflare Ray ID: $h-$j"
      case 19 => s"Shared   body\ttext of ${hostName(h)} page ${j - 1}\nparagraph."
      // non-ASCII whitespace (NBSP + U+2028): exercises the Python-\s
      // contentHash semantics — a DUP of page j-1 differing only in
      // whitespace flavor, so it must dedup as "skipped" in both engines
      case 29 => s"Shared \u00a0 body\u3000text of ${hostName(h)} page ${j - 1}\u2028paragraph."
      case _  => s"Shared   body\ttext of ${hostName(h)} page $j\nparagraph."
    }
    // tree links: children B*j+1 .. B*j+B, href shape varies by child index
    val children = (1 to p.branching).map(k => p.branching * j + k).filter(_ < n)
    val childLinks = children.map { c =>
      val cu = pageUrl(h, c)
      if (j == 0) cu
      else (c % 4) match {
        case 0 => cu                                     // absolute
        case 1 => pagePath(c)                            // path-absolute
        case 2 => cu.substring(cu.lastIndexOf('/') + 1) // relative
        case _ => cu + "/"                               // trailing slash
      }
    }
    val noise = Seq(
      s"$url#section",            // contains '#' → extractor skips
      "mailto:team@example.test", // skipped
      "javascript:void(0)",       // skipped
      "tel:+1234",                // skipped
      "https://other-domain.test/elsewhere", // other domain → dropped
      s"HTTPS://${hostName(h).toUpperCase}/docs" // case variant of seed → dedup
    )
    // nav selector links on the seed page of nav hosts: a TOC of the first
    // pages + noise hrefs exercising the startswith-skip rules
    val navLinks =
      if (j == 0 && hasNav(h)) {
        val toc = (1 until math.min(n, 41)).map { c =>
          if (c % 3 == 0) pagePath(c) else pageUrl(h, c)
        }
        toc ++ Seq("#top", "javascript:void(0)", "mailto:x@y.z",
          "https://elsewhere.test/x", pageUrl(h, 1) + "/")
      } else Seq.empty[String]
    val ok = status == 200 && contentType == "text/html" && (j % 31 != 17)
    val globalIdx = hostOffsets(p)(h) + j
    val refs =
      if (ok) Seq(imageId(2 * globalIdx), imageId(2 * globalIdx + 1)) else Seq.empty
    val method = Seq("cache", "native", "proxy", "http_fast", "playwright")(j % 5) // the chain's real A2 labels
    Page(url, status, contentType, content, childLinks ++ noise, navLinks,
      refs, method, 50L + (j % 7) * 10L)
  }

  /** robots.txt per host: /docs/private/ disallowed with an /ok carve-out;
    * host 1 gets a crawl-delay (politeness-budget variation). */
  def robotsTxt(h: Int): String = {
    val base =
      """User-agent: *
        |Disallow: /docs/private/
        |Allow: /docs/private/ok
        |""".stripMargin
    if (h == 1) base + "Crawl-delay: 2\n" else base
  }

  def seeds(p: Params): Seq[String] = (0 until p.hosts).map(seedUrl)

  // ---- sitemaps (S1 / cascade O1): every third host publishes one ----

  def hasSitemap(h: Int): Boolean = h % 3 == 2

  private def urlsetXml(urls: Seq[String]): Array[Byte] =
    (s"""<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |${urls.map(u => s"<url><loc>$u</loc></url>").mkString("\n")}
        |</urlset>""".stripMargin).getBytes("UTF-8")

  private def indexXml(children: Seq[String]): Array[Byte] =
    (s"""<?xml version="1.0" encoding="UTF-8"?>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |${children.map(u => s"<sitemap><loc>$u</loc></sitemap>").mkString("\n")}
        |</sitemapindex>""".stripMargin).getBytes("UTF-8")

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }

  /** Sitemap bodies for host h: a root index → one plain urlset + one
    * gzipped urlset, listing the even-numbered pages plus noise entries
    * (other domain, outside base path, uppercase-host and trailing-slash
    * variants) exercising the reference's admission rules. */
  def sitemapBodies(p: Params, h: Int): Map[String, (Array[Byte], Boolean)] =
    if (!hasSitemap(h)) Map.empty
    else {
      val host = hostName(h)
      val even = (0 until pageCount(p, h) by 2).map(j => pageUrl(h, j))
      val (first, second) = even.splitAt(even.size / 2)
      val noise = Seq(
        "https://other-domain.test/docs/x",
        s"https://$host/outside/page",
        s"HTTPS://${host.toUpperCase}/docs/p2",
        s"https://$host/docs/p2/")
      Map(
        s"https://$host/sitemap.xml" ->
          (indexXml(Seq(s"https://$host/sm-1.xml", s"https://$host/sm-2.xml.gz")), false),
        s"https://$host/sm-1.xml" -> (urlsetXml(first ++ noise), false),
        s"https://$host/sm-2.xml.gz" -> (gzip(urlsetXml(second)), true))
    }

  def sitemapsDF(spark: SparkSession, p: Params): DataFrame = {
    import spark.implicits._
    (0 until p.hosts).flatMap(h => sitemapBodies(p, h).toSeq.map {
      case (u, (b, gz)) => (u, b, gz)
    }).toDF("sitemap_url", "body", "gzipped")
  }

  // ---- image payload (input_hint schema) ----

  def imageDims(i: Long): (Int, Int) =
    (Seq(32, 64, 128, 256)((i % 4).toInt), Seq(32, 48, 96, 192)((i % 4).toInt))

  def imageFmt(i: Long): String = if (i % 2 == 0) "png" else "jpg"

  def caption(i: Long): String = {
    val toks = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val t1 = toks((i % 6).toInt); val t2 = toks(((i / 6) % 6).toInt)
    val uni = if (i % 13 == 0) " – café 图片" else ""
    s"caption $i: $t1 $t2$uni"
  }

  final case class ImageRow(
      image_id: String, bytes: Array[Byte], w: Int, h: Int, fmt: String,
      caption: String, phash: Long)

  /** Deterministic image row for global image index i (encode once; phash
    * computed from the ENCODED bytes so lossy round-trips agree). */
  def imageRow(i: Long): ImageRow = {
    val (w, h) = imageDims(i)
    val img = ImageOps.toImage(ImageOps.syntheticPixels(i, w, h), w, h)
    val bytes = ImageOps.encode(img, imageFmt(i))
    ImageRow(imageId(i), bytes, w, h, imageFmt(i), caption(i),
      ImageOps.phash64(bytes))
  }

  // ---- Spark generators (distributed; parallelism scales with cluster) ----

  def imagesDF(spark: SparkSession, p: Params): DataFrame = {
    import spark.implicits._
    spark.range(totalImages(p)).as[Long].map(imageRow).toDF()
  }

  /** images table of an arbitrary row count (bench scale). */
  def imagesDF(spark: SparkSession, count: Long): DataFrame = {
    import spark.implicits._
    spark.range(count).as[Long].map(imageRow).toDF()
  }

  /** q35 fixture: a deterministic multi-frame Y4M payload per doc id —
    * (d%3)+1 uniform 8×4 4:2:0 frames, luma `16 + (31d+7k)%220` (within the
    * 16..235 studio range), neutral chroma 128. The decoded gray is the
    * closed form `(298·((31d+7k)%220)+128)>>8`, which the DuckDB oracle
    * recomputes in integer SQL — so the REAL [[graft.functions.Y4m]] parse
    * + BT.601 conversion is driver-gated end to end. */
  def y4mBytes(docId: Long): Array[Byte] = {
    val w = 8; val h = 4
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val nFrames = (docId % 3).toInt + 1
    val ySize = w * h; val cSize = (w / 2) * (h / 2)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + nFrames * (marker.length + ySize + 2 * cSize))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    var k = 0
    while (k < nFrames) {
      System.arraycopy(marker, 0, out, pos, marker.length); pos += marker.length
      val luma = (16 + (31 * docId + 7 * k) % 220).toByte
      java.util.Arrays.fill(out, pos, pos + ySize, luma); pos += ySize
      java.util.Arrays.fill(out, pos, pos + 2 * cSize, 128.toByte); pos += 2 * cSize
      k += 1
    }
    out
  }

  /** q36 fixture: a deterministic PCM WAV per doc id — 16-bit mono at
    * 8000 Hz, `100 + d%50` frames of a ±A square wave with
    * `A = 1000 + (d%100)·31`. Every feature is closed-form for the DuckDB
    * oracle: peak = A, RMS = A exactly (each sample² is A²), duration =
    * frames·1000/8000 ms. A LIST chunk sits between fmt and data so the
    * parser must actually WALK chunks, not assume fixed offsets. */
  def wavBytes(docId: Long): Array[Byte] = {
    val n = 100 + (docId % 50).toInt
    val amp = (1000 + (docId % 100) * 31).toInt
    val samples = Array.tabulate(n)(i => if (i % 2 == 0) amp else -amp)
    val plain = graft.functions.Wav.encodePcm16Mono(samples, 8000)
    // splice a LIST/INFO chunk (8 + 4 bytes) between "fmt " and "data"
    val list = "LIST".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](plain.length + list.length)
    System.arraycopy(plain, 0, out, 0, 36) // RIFF..fmt end
    System.arraycopy(list, 0, out, 36, list.length)
    System.arraycopy(plain, 36, out, 36 + list.length, plain.length - 36)
    // RIFF size grew by the spliced chunk
    val riffLen = (out.length - 8).toLong
    (0 until 4).foreach(j => out(4 + j) = ((riffLen >> (8 * j)) & 0xff).toByte)
    out
  }

  /** q37 fixture: a deterministic G.711 WAV per doc id — mono 8000 Hz,
    * `80 + d%40` code frames alternating `b0 = (37d)%256` and its
    * sign-flip `b0 ^ 0x80` (exact negation under BOTH laws: μ-law's
    * complement and A-law's 0x55 toggle leave bit 7 in place), codec
    * μ-law (tag 7) for even ids / A-law (tag 6) for odd. Every feature is
    * closed-form for the DuckDB oracle: peak = RMS = |G.711 expand(b0)|,
    * which the oracle recomputes with the same ITU integer math in SQL.
    * A `fact` chunk sits between fmt and data (as real G.711 WAVs carry)
    * so fixed-offset parsing would misparse. */
  def g711Bytes(docId: Long): Array[Byte] = {
    val n = 80 + (docId % 40).toInt
    val b0 = ((docId * 37) % 256).toInt
    val codes = Array.tabulate(n)(i => (if (i % 2 == 0) b0 else b0 ^ 0x80).toByte)
    val tag = if (docId % 2 == 0) 7 else 6
    val plain = graft.functions.Wav.encodeG711Mono(codes, 8000, tag)
    // splice a fact chunk (8 + 4 bytes: dwSampleLength) between fmt and data
    val fact = "fact".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](4, 0, 0, 0) ++
      Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte, 0, 0)
    val out = new Array[Byte](plain.length + fact.length)
    System.arraycopy(plain, 0, out, 0, 36) // RIFF..fmt end
    System.arraycopy(fact, 0, out, 36, fact.length)
    System.arraycopy(plain, 36, out, 36 + fact.length, plain.length - 36)
    val riffLen = (out.length - 8).toLong
    (0 until 4).foreach(j => out(4 + j) = ((riffLen >> (8 * j)) & 0xff).toByte)
    out
  }

  /** q39 fixture: a deterministic IMA ADPCM WAV per doc id — mono 8000 Hz,
    * TWO blocks of `nib = 60 + 2·(d%20)` nibbles, block headers
    * `(P, idx₁)` / `(−P, idx₂)` with `P = (131d)%20000 − 10000`. Three
    * closed-form patterns by `d%3` (each decoded sample is exact integer
    * math, so the DuckDB oracle regenerates the signal and aggregates it
    * in SQL):
    *  - 0: nibbles all 3, idx₁=0 idx₂=2 — block 1 ramps +4/sample (step
    *    pinned at table[0]=7 by the −1 index delta clamping at 0); block 2
    *    starts at step index 2, so deltas run 7, 7, then 4s — proving the
    *    per-block state RESEED and the index walk through three step sizes.
    *  - 1: nibbles alternate 7, 0xF, idx=88 — step pinned at the table top
    *    (32767, diff 61436): P, then +32767 (positive CLAMP fires) /
    *    −28669 = 32767−61436 (no clamp — the diff from the ceiling
    *    undershoots the floor) alternating; the +8 index delta clamps
    *    at 88 throughout.
    *  - 2: nibbles all 0, idx=0 — diff = 7>>3 = 0: the signal IS the two
    *    header predictors (header passthrough, zero-magnitude path).
    * No pattern ever hits an unmodeled clamp (|P| ≤ 10000, ramp max
    * 10391 < 32767), so the SQL formulas are exact. */
  def adpcmBytes(docId: Long): Array[Byte] = {
    import graft.functions.Wav
    val nib = 60 + 2 * (docId % 20).toInt
    val p = ((docId * 131) % 20000 - 10000).toInt
    val (idx1, idx2, pattern) = (docId % 3) match {
      case 0 => (0, 2, Array.fill(nib)(3))
      case 1 => (88, 88, Array.tabulate(nib)(i => if (i % 2 == 0) 7 else 0xf))
      case _ => (0, 0, Array.fill(nib)(0))
    }
    Wav.encodeAdpcmMono(
      Seq(Wav.AdpcmBlock(p, idx1, pattern), Wav.AdpcmBlock(-p, idx2, pattern)),
      8000)
  }

  /** q40 fixture: a deterministic FLAC stream per doc id — bps 16,
    * 8000 Hz, TWO frames of `B = 64 + 2·(d%16)` samples; the base value
    * `P = (97d)%16000 − 8000` negates in frame 1 (`s0 = P / −P`), so
    * every payload exercises per-frame re-sync, coded frame numbers, and
    * both CRCs twice. Four closed-form patterns by `d%4` (each decoded
    * sample is exact integer math, so the DuckDB oracle regenerates the
    * signal and aggregates it in SQL):
    *  - 0: CONSTANT subframe — v = s0 (1 wire sample expands to B)
    *  - 1: FIXED order-1 ramp — v = s0 + 3k (constant Rice residual 3,
    *    TWO partitions: the multi-partition walk is on the wire)
    *  - 2: LPC order 1, coef −32 shift 5 (x[n] = −x[n−1] exactly) —
    *    v = s0·(−1)^k, all residuals zero after the warmup
    *  - 3: stereo MID/SIDE — left = s0 + 2k, right = s0 − 2k (the
    *    stored mid is the constant s0, the stored side the order-1 ramp
    *    4k: decorrelation undo + the side channel's +1 bit width both
    *    on the wire)
    * No value exceeds 16 bits (|s0| ≤ 8000, ramp max 8279), so the SQL
    * formulas are exact. */
  /** q44 fixture: a deterministic MS ADPCM WAV per doc id (fmt tag 0x02 —
    * the 2-tap LPC codec, structurally different from IMA's step walk) at
    * 8000 Hz, TWO blocks so the per-block reseed is always on the wire.
    * Three closed-form patterns by `d%3` (each decoded sample is exact
    * integer math, so the DuckDB oracle regenerates the signal in SQL):
    *  - 0: mono, bpred 0 (c1=256: predictor = sample1 exactly), nibbles
    *    all 0 — signal is s2 then s1 repeated: frame ORDER proof (the
    *    header stores sample1 first but sample2 is the OLDER frame 0).
    *    Blocks (P, P+9) / (−P, −P+9), `P = (113d)%18000 − 9000`.
    *  - 1: mono, bpred 1 (c1=512, c2=−256: x = 2x₁ − x₂, exact — the sum
    *    is always a multiple of 256 so the >>8 loses nothing), nibbles 0 —
    *    a perfect linear ramp that CLAMPS: block 0 ramps +S from
    *    P₁ = 20000 + (d%100)·97 into the +32767 ceiling, block 1 ramps −S
    *    from −P₁ into the −32768 floor (both clamp bounds on the wire;
    *    once clamped the recurrence pins there, so min/greatest is exact).
    *  - 2: STEREO, bpred 0 both — header layout + per-nibble channel
    *    alternation: first data byte carries (4, 12) = +4·ΔL on L (high
    *    nibble) and −4·ΔR on R (low nibble, SIGNED), rest 0 so both
    *    channels hold constant after; ΔL = 64 + d%32, ΔR = 48 + d%16.
    * No pattern hits an unmodeled clamp (|P| ≤ 9000, stereo max ≈ 9400;
    * delta adaptation only ever scales nibble-0 contributions). */
  def msAdpcmBytes(docId: Long): Array[Byte] = {
    import graft.functions.Wav
    val p = ((docId * 113) % 18000 - 9000).toInt
    (docId % 3) match {
      case 0 =>
        val nib = 50 + 2 * (docId % 25).toInt
        def blk(s0: Int) = Wav.MsBlock(
          Seq(Wav.MsChan(0, 100, s0 + 9, s0)), Array.fill(nib)(0))
        Wav.encodeMsAdpcm(Seq(blk(p), blk(-p)), 8000)
      case 1 =>
        val nib = 50 + 2 * (docId % 25).toInt
        val p1 = (20000 + (docId % 100) * 97).toInt
        val st = (300 + (docId % 50) * 23).toInt
        val up = Wav.MsBlock(
          Seq(Wav.MsChan(1, 100, p1 + st, p1)), Array.fill(nib)(0))
        val dn = Wav.MsBlock(
          Seq(Wav.MsChan(1, 100, -p1 - st, -p1)), Array.fill(nib)(0))
        Wav.encodeMsAdpcm(Seq(up, dn), 8000)
      case _ =>
        val nf = 40 + (docId % 20).toInt
        val dl = (64 + docId % 32).toInt
        val dr = (48 + docId % 16).toInt
        def blk(s0: Int) = Wav.MsBlock(
          Seq(Wav.MsChan(0, dl, s0 + 11, s0), Wav.MsChan(0, dr, -s0 + 5, -s0)),
          Array.tabulate(2 * nf)(i => if (i == 0) 4 else if (i == 1) 12 else 0))
        Wav.encodeMsAdpcm(Seq(blk(p), blk(-p)), 8000)
    }
  }

  /** q45 fixture: a deterministic 16×16 QOI image per doc id. The pixel
    * gray is the closed form `v(x,y) = (A + 5·(y/4) + x·(y%3)) % 256`
    * with `A = 30 + (29d)%180` — rows cycle constant / +1-per-pixel /
    * +2-per-pixel, so the greedy encoder naturally lays RUN, DIFF, and
    * LUMA chunks on the wire (QoiSpec asserts all op families appear),
    * and no value ever wraps (max 254), keeping the SQL formula exact.
    * Odd ids declare 4 channels (the RGBA header path) — QOI is lossless
    * either way, so decode must EQUAL the formula. */
  def qoiBytes(docId: Long): Array[Byte] = {
    val a = (30 + (29 * docId) % 180).toInt
    val px = Array.tabulate(256) { i =>
      val x = i % 16; val y = i / 16
      val v = (a + 5 * (y / 4) + x * (y % 3)) % 256
      0xff000000 | (v << 16) | (v << 8) | v
    }
    graft.functions.Qoi.encode(px, 16, 16, channels = if (docId % 2 == 0) 3 else 4)
  }

  /** q48 fixture: a deterministic 21×13 lossless WebP (VP8L) per doc id.
    * The gray closed form `v(x,y) = (A + 5·(y/4) + x·(y%3)) % 256` with
    * `A = 20 + (29d)%170` never wraps (max 244), so the SQL oracle
    * regenerates it exactly; the odd width/height exercise the transform
    * sub-image rounding and sub-byte palette bundling tails. `d % 6`
    * cycles the encoder through every transform family and entropy
    * feature the decoder owns — plain LZ77, subtract-green + color
    * cache, per-block prediction (mode rotating through all 14),
    * cross-color, the palette path (≤256 distinct grays by
    * construction), and the full transform stack — so each is on the
    * wire at every scale, not just in unit specs. VP8L is lossless
    * through all of them: decode must EQUAL the formula. */
  def webpBytes(docId: Long): Array[Byte] = {
    import graft.functions.Webp
    val a = (20 + (29 * docId) % 170).toInt
    val px = Array.tabulate(21 * 13) { i =>
      val x = i % 21; val y = i / 21
      val v = (a + 5 * (y / 4) + x * (y % 3)) % 256
      0xff000000 | (v << 16) | (v << 8) | v
    }
    val opts = (docId % 6) match {
      case 0 => Webp.WebpOptions()
      case 1 => Webp.WebpOptions(subtractGreen = true, cacheBits = 4)
      case 2 => Webp.WebpOptions(predictorMode = ((docId / 6) % 14).toInt,
        predictorBits = 3)
      case 3 => Webp.WebpOptions(colorTransform = true, colorBits = 3,
        greenToRed = 13, greenToBlue = -9, redToBlue = 21)
      case 4 => Webp.WebpOptions(palette = true, lz77 = false)
      case _ => Webp.WebpOptions(subtractGreen = true,
        predictorMode = ((docId / 6) % 14).toInt, colorTransform = true,
        greenToRed = -5, greenToBlue = 7, redToBlue = -11, cacheBits = 6)
    }
    Webp.encode(px, 21, 13, opts)
  }

  /** q46 fixture: the big-endian audio containers. Even docs: an AIFF
    * (16-bit BE PCM, square wave ±A with `A = 900 + (d%90)·37`,
    * `n = 60 + d%40` frames) whose sample rate `8000 + 1000·(d%5)` rides
    * the REAL 80-bit extended-precision COMM field — a wrong exponent
    * bias, hidden-bit assumption, or signed-mantissa bug shifts the rate
    * and reddens dur_ms; a NAME chunk sits before COMM so the walk is
    * always exercised. Odd docs: a Sun AU with an 8-byte annotation
    * region (data offset 32 — fixed-24 parsing misreads), code byte
    * `b0 = (41d)%256` alternating with its sign-flip, μ-law for d%4==1 /
    * A-law for d%4==3, `n = 70 + d%30` — peak = RMS = |expand(b0)|,
    * which the oracle recomputes with the same ITU integer math as q37. */
  def bigEndianAudioBytes(docId: Long): Array[Byte] =
    if (docId % 2 == 0) {
      val n = 60 + (docId % 40).toInt
      val amp = (900 + (docId % 90) * 37).toInt
      val sr = (8000 + 1000 * (docId % 5)).toInt
      val plain = graft.functions.Aiff.encodePcm16Mono(
        Array.tabulate(n)(i => if (i % 2 == 0) amp else -amp), sr)
      // splice a NAME chunk (8 + 4 bytes) between "AIFF" and COMM
      val name = "NAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        Array[Byte](0, 0, 0, 4) ++
        "doc!".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](plain.length + name.length)
      System.arraycopy(plain, 0, out, 0, 12) // FORM..AIFF
      System.arraycopy(name, 0, out, 12, name.length)
      System.arraycopy(plain, 12, out, 12 + name.length, plain.length - 12)
      val formLen = out.length - 8 // big-endian size fixup
      (0 until 4).foreach(j => out(4 + j) = ((formLen >> (8 * (3 - j))) & 0xff).toByte)
      out
    } else {
      val n = 70 + (docId % 30).toInt
      val b0 = ((docId * 41) % 256).toInt
      val codes = Array.tabulate(n)(i => (if (i % 2 == 0) b0 else b0 ^ 0x80).toByte)
      val enc = if (docId % 4 == 1) 1 else 27 // μ-law / A-law
      graft.functions.Au.encodeMono(codes, 8000, enc, annotation = 8)
    }

  /** q47 fixture: an uncompressed BI_RGB DIB/AVI per doc id, 6×5 frames
    * (`nf = d%3 + 1`) — dimensions chosen so BOTH bit depths carry
    * nonzero stride padding (24-bit rows are 18→20 bytes, 8-bit rows
    * 6→8). Three variants by `d%3`:
    *  - 0: 24-bit BOTTOM-UP, gray `v(x,y) = b0 + x + 2y` with
    *    `b0 = 20 + (31d + 7k)%200` — the x/y gradient reddens any stride
    *    or row-order mistake (a non-flipped read maps y → h−1−y).
    *  - 1: 8-bit PALETTED bottom-up: index `(x + y + 3k) % 16`, palette
    *    gray `p0 + 5i` with the per-FILE base `p0 = 10 + (29d)%160`
    *    (palettes live in the strf — one per stream, not per frame).
    *  - 2: 24-bit TOP-DOWN (negative strf biHeight): same gradient —
    *    decode must NOT flip.
    * All values ≤ 244: no wrap, so the SQL formulas are exact. */
  def aviDibBytes(docId: Long): Array[Byte] = {
    val w = 6; val h = 5
    val nf = (docId % 3).toInt + 1
    (docId % 3) match {
      case 1 =>
        val p0 = (10 + (29 * docId) % 160).toInt
        val frames = (0 until nf).map { k =>
          Array.tabulate[Byte](w * h)(i => (((i % w) + (i / w) + 3 * k) % 16).toByte)
        }
        val pal = Array.tabulate(256) { i =>
          val v = p0 + 5 * (i % 16)
          0xff000000 | (v << 16) | (v << 8) | v
        }
        graft.functions.Avi.encodeDib8(w, h, pal, frames)
      case pat =>
        val frames = (0 until nf).map { k =>
          val b0 = (20 + (31 * docId + 7 * k) % 200).toInt
          val px = Array.tabulate(w * h) { i =>
            val v = b0 + (i % w) + 2 * (i / w)
            0xff000000 | (v << 16) | (v << 8) | v
          }
          graft.functions.ImageOps.toImage(px, w, h)
        }
        graft.functions.Avi.encodeDib24(frames, topDown = pat == 2)
    }
  }

  def flacBytes(docId: Long): Array[Byte] = {
    import graft.functions.Flac
    val b = 64 + 2 * (docId % 16).toInt
    val p = ((docId * 97) % 16000 - 8000).toInt
    def frame(s0: Int): Flac.Frame = (docId % 4) match {
      case 0 => Flac.Frame(0, Seq(Flac.SubConstant(s0.toLong, b)))
      case 1 => Flac.Frame(0, Seq(Flac.SubFixed(1,
        Array.tabulate(b)(k => s0 + 3L * k), partitionOrder = 1)))
      case 2 => Flac.Frame(0, Seq(Flac.SubLpc(Array(-32), 5, 6,
        Array.tabulate(b)(k => if (k % 2 == 0) s0.toLong else -s0.toLong))))
      case _ => Flac.Frame(10, Seq(
        Flac.SubConstant(s0.toLong, b),
        Flac.SubFixed(1, Array.tabulate(b)(k => 4L * k))))
    }
    Flac.encodeFlac(Seq(frame(p), frame(-p)), 8000, 16)
  }

  /** q38 fixture: a deterministic MJPEG/AVI payload per doc id —
    * (d%3)+1 uniform 16×16 frames, gray `10 + (29d+13k)%236`, each frame
    * a real baseline JPEG from the JDK codec inside a spec-complete AVI
    * container. Uniform frames survive JPEG quantization to within a few
    * gray levels (only the DC coefficient is nonzero, and the q≈0.97
    * DC quant step is ~1), so the query's decode gate (every pixel within
    * ±4 of the formula) is deterministic; the oracle emits the expected
    * (frame_idx, 16, 16, true) rows in closed form. */
  def aviMjpegBytes(docId: Long): Array[Byte] = {
    val nFrames = (docId % 3).toInt + 1
    val frames = (0 until nFrames).map { k =>
      val g = (10 + (29 * docId + 13 * k) % 236).toInt
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      (0 until 16).foreach(y => (0 until 16).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    graft.functions.Avi.encodeMjpeg(frames)
  }

  /** q43 fixture: a deterministic INTER-FRAME RLE8/AVI payload per doc id
    * — (d%3)+1 frames on a 16×16 canvas. Frame 0 is a keyframe filling the
    * canvas with gray `bg = 20 + 43d % 225`; every later frame k paints
    * ONLY an 8×8 patch at (4,4) with gray `20 + (43d + 19k) % 225` and
    * SKIPS the rest via delta moves — so the background pixels of frame k
    * are only correct if the decoder retained frame k−1's canvas (the
    * defining inter-frame property; a standalone-frame decode shows black
    * there and reddens the hash). Patch rows alternate run/absolute
    * opcodes by k's parity, keeping both families on the wire. The
    * identity gray palette makes the check exact (lossless). */
  def aviRleBytes(docId: Long): Array[Byte] = {
    val nFrames = (docId % 3).toInt + 1
    val bg = (20 + (43 * docId) % 225).toInt
    val ops = (0 until nFrames).map { k =>
      if (k == 0) graft.functions.Rle8.opFull(16, 16, bg)
      else {
        val g = (20 + (43 * docId + 19 * k) % 225).toInt
        graft.functions.Rle8.opPatch(16, 16, 4, 4, 8, 8, g, absolute = k % 2 == 0)
      }
    }
    graft.functions.Avi.encodeRle8(16, 16, graft.functions.Rle8.grayPalette, ops)
  }

  /** q41 fixture: a deterministic animated GIF per doc id — (d%3)+1
    * full-screen 16×16 uniform-gray frames, gray `12 + (37d + 11k) % 232`.
    * GIF is palette + LZW (lossless given an in-palette color), so the
    * decoded pixel must equal the formula EXACTLY — no ±tolerance. */
  def gifBytes(docId: Long): Array[Byte] = {
    val nFrames = (docId % 3).toInt + 1
    val frames = (0 until nFrames).map { k =>
      val g = (12 + (37 * docId + 11 * k) % 232).toInt
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      (0 until 16).foreach(y => (0 until 16).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    graft.functions.Gif.encodeGif(frames)
  }

  /** q42 fixture: a deterministic APNG per doc id — (d%3)+1 full-canvas
    * 16×16 uniform-gray frames, gray `14 + (41d + 17k) % 230`, blend
    * source / dispose none; stream shape alternates by parity of d:
    * even docs carry the default image AS frame 0 (pre-IDAT fcTL), odd
    * docs EXCLUDE it (all animation frames ride fdAT) — both spec
    * layouts are on the wire every round. PNG is lossless, so the
    * decoded pixel must equal the formula EXACTLY. */
  def apngBytes(docId: Long): Array[Byte] = {
    val nFrames = (docId % 3).toInt + 1
    val frames = (0 until nFrames).map { k =>
      val g = (14 + (41 * docId + 17 * k) % 230).toInt
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      (0 until 16).foreach(y => (0 until 16).foreach(x => img.setRGB(x, y, rgb)))
      (img, 0, 0, 0, 0): graft.functions.Apng.Placed
    }
    graft.functions.Apng.encodeApng(frames, defaultImageExcluded = docId % 2 == 1)
  }

  /** q49 fixture: a deterministic ANIMATED WebP per doc id — and, like
    * the RLE8 fixture, an INTER-FRAME one: frame 0 is a full-canvas
    * 20×12 uniform gray `g0 = 16 + (47d) % 224`; frames k ≥ 1 paint ONLY
    * an 8×6 patch at (6,4) with gray `16 + (47d + 23k) % 224`
    * (do-not-blend, dispose none), so the sampled background at frame k
    * is correct only if the decoder composited every prior frame onto
    * the canvas — a standalone-frame decode shows transparent there and
    * emits -1. The per-frame VP8L options alternate plain /
    * subtract-green+cache by (d+k) parity so both entropy shapes ride
    * the animation path every round. VP8L is lossless → exact equality
    * with the two-region closed form. */
  def animWebpBytes(docId: Long): Array[Byte] = {
    val nFrames = (docId % 3).toInt + 1
    def uniform(w: Int, h: Int, g: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    val g0 = (16 + (47 * docId) % 224).toInt
    val frames: Seq[graft.functions.AnimWebp.Placed] =
      (uniform(20, 12, g0), 0, 0, 0, 1) +: (1 until nFrames).map { k =>
        val gk = (16 + (47 * docId + 23 * k) % 224).toInt
        (uniform(8, 6, gk), 6, 4, 0, 1): graft.functions.AnimWebp.Placed
      }
    graft.functions.AnimWebp.encodeAnimWebp(frames,
      optsFor = k => if ((docId + k) % 2 == 0) graft.functions.Webp.WebpOptions()
      else graft.functions.Webp.WebpOptions(subtractGreen = true, cacheBits = 4))
  }

  /** q50 fixture: a deterministic favicon-shaped ICO per doc id — a
    * 2-member directory whose FIRST member is a 6×5 low-depth decoy (the
    * best-member selection must skip it) and whose second is the real
    * 18×11 image: a QUADRANT pattern — gray `ga = 24 + (31d) % 200`
    * where `(x<9) == (y<6)`, `gb = 16 + (37d) % 224` elsewhere. The
    * pattern varies along BOTH axes with an odd height, so a stride,
    * nibble/bit-packing, OR bottom-up row-order slip (the 11-row flip is
    * asymmetric around the 6-row boundary) moves mass across the
    * position-weighted checksum. `d % 6` cycles the member depth through
    * 1/4/8/24/32-bpp DIBs and an embedded PNG, so every layout the
    * decoder owns is on the wire at every scale. ICO DIBs are exact →
    * the decoded image must EQUAL the quadrant closed form. */
  def icoBytes(docId: Long): Array[Byte] = {
    import graft.functions.Ico
    val ga = (24 + (31 * docId) % 200).toInt
    val gb = (16 + (37 * docId) % 224).toInt
    val px = Array.tabulate(18 * 11) { i =>
      val x = i % 18; val y = i / 18
      val g = if ((x < 9) == (y < 6)) ga else gb
      0xff000000 | (g << 16) | (g << 8) | g
    }
    val depth = (docId % 6) match {
      case 0 => 1; case 1 => 4; case 2 => 8
      case 3 => 24; case 4 => 32; case _ => 0 // 0 = embedded PNG member
    }
    val decoyG = (40 + (13 * docId) % 180).toInt
    val decoy = Array.fill(6 * 5)(0xff000000 | (decoyG << 16) | (decoyG << 8) | decoyG)
    Ico.encode(Seq(
      Ico.Member(decoy, 6, 5, 1),
      Ico.Member(px, 18, 11, depth)))
  }

  /** q51 fixture: a deterministic TGA per doc id — the 17×10 quadrant
    * pattern (grays `ga = 28 + (41d) % 200` where `(x<8) == (y<5)`, else
    * `gb = 12 + (53d) % 228`; varies along both axes so origin-flip and
    * RLE-packet slips move the position-weighted checksum). `d % 6`
    * cycles the wire type through truecolor 24/32, RLE truecolor,
    * palette raw/RLE, and grayscale; origin alternates top-down /
    * bottom-up by parity of d, and the palette-RLE variant also flips
    * right-to-left. TGA is exact → decode must EQUAL the closed form. */
  def tgaBytes(docId: Long): Array[Byte] = {
    import graft.functions.Tga
    val ga = (28 + (41 * docId) % 200).toInt
    val gb = (12 + (53 * docId) % 228).toInt
    val px = Array.tabulate(17 * 10) { i =>
      val x = i % 17; val y = i / 17
      val g = if ((x < 8) == (y < 5)) ga else gb
      0xff000000 | (g << 16) | (g << 8) | g
    }
    val topDown = docId % 2 == 0
    (docId % 6) match {
      case 0 => Tga.encode(px, 17, 10, imgType = 2, depth = 24, topDown)
      case 1 => Tga.encode(px, 17, 10, imgType = 2, depth = 32, topDown)
      case 2 => Tga.encode(px, 17, 10, imgType = 10, depth = 24, topDown)
      case 3 => Tga.encode(px, 17, 10, imgType = 1, depth = 8, topDown)
      case 4 => Tga.encode(px, 17, 10, imgType = 9, depth = 8, topDown,
        rightToLeft = true)
      case _ => Tga.encode(px, 17, 10, imgType = 3, depth = 8, topDown)
    }
  }

  /** q52 fixture: a deterministic MPEG1 Layer-III frame chain per doc —
    * `n = 40 + d%30` frames, sample rate cycling 44100/48000/32000 by
    * d%3, bitrate index `1 + d%14` (the full V1L3 table over 14 docs),
    * mono by d-parity, and every fourth doc wears a leading ID3v2 tag
    * (syncsafe size `37 + d%50`) the walk must skip. Headers are real,
    * payloads zeroed — the metadata op never reads past the header, and
    * sample decode is exactly what [[graft.functions.Mpeg]] honestly
    * does NOT do. Closed form: duration_ms = n·1152·1000 ÷ rate. */
  def mp3Bytes(docId: Long): Array[Byte] =
    graft.functions.Mpeg.encodeFrames(
      nFrames = (40 + docId % 30).toInt,
      srIdx = (docId % 3).toInt,
      brIdx = (1 + docId % 14).toInt,
      mono = docId % 2 == 0,
      id3v2Bytes = if (docId % 4 == 0) (37 + docId % 50).toInt else 0)

  /** q53 fixture: a deterministic ISO-BMFF (MP4) box tree per doc —
    * `n = 24 + d%48` video samples at delta 512 / timescale 12800
    * (exactly 40n ms), an audio track at 20 ms/frame (delta = rate/50,
    * all three rates divide), video codec fourcc cycling
    * avc1/hev1/vp09/av01 by d%4, audio mp4a/Opus by d-parity, major
    * brand isom/mp42/mp41 by d%3, dims `w = 160+16(d%28)`,
    * `h = 90+2(d%40)`. Structure variants that must not change the
    * outputs: version-1 mvhd/mdhd (d%5=0), 64-bit largesize mdat
    * (d%7=0), a uuid box inside moov (d%6=0). Box tree is real,
    * mdat zeroed — the metadata walk never reads samples, and sample
    * decode is exactly what [[graft.functions.Mp4]] honestly does
    * NOT do. */
  def mp4Bytes(docId: Long): Array[Byte] = {
    import graft.functions.Mp4
    val n = (24 + docId % 48).toInt
    val rate = Seq(48000, 44100, 32000)((docId % 3).toInt)
    Mp4.encode(
      brand = Seq("isom", "mp42", "mp41")((docId % 3).toInt),
      movieTimescale = 600,
      video = Some(Mp4.VideoSpec(
        codec = Seq("avc1", "hev1", "vp09", "av01")((docId % 4).toInt),
        w = (160 + 16 * (docId % 28)).toInt,
        h = (90 + 2 * (docId % 40)).toInt,
        nSamples = n, delta = 512, timescale = 12800)),
      audio = Some(Mp4.AudioSpec(
        codec = if (docId % 2 == 0) "mp4a" else "Opus",
        rate = rate, channels = (1 + docId % 2).toInt,
        nSamples = n, delta = rate / 50)),
      v1Boxes = docId % 5 == 0,
      largesizeMdat = docId % 7 == 0,
      uuidInMoov = docId % 6 == 0,
      mdatLen = 48 + (docId % 64).toInt)
  }

  /** q54 fixture: a real JDK-encoded JPEG (`w = 24 + d%40`,
    * `h = 16 + d%32`) with a spliced EXIF APP1 — byte order by d-parity
    * (II/MM both live), orientation `1 + d%8`, make `cam-(d%5)`, model
    * `m-(d%7)`, timestamp `2026:0(1+d%9):15 12:00:00`, Exif pixel dims
    * `1000 + d%100` × `2000 + d%50`, ISO `100(1 + d%16)`, and a GPS IFD
    * on every third doc (the has_gps PII-scrub signal). The SOF dims are
    * the JDK encoder's own — the walk reads them from the real marker
    * stream, not from this spec. */
  def jpegExifBytes(docId: Long): Array[Byte] = {
    import graft.functions.{ImageOps, Jpeg}
    val w = (24 + docId % 40).toInt
    val h = (16 + docId % 32).toInt
    val jpeg = ImageOps.encode(ImageOps.toImage(ImageOps.syntheticPixels(docId, w, h), w, h), "jpg")
    Jpeg.injectExif(jpeg, Jpeg.ExifSpec(
      orientation = (1 + docId % 8).toInt,
      make = s"cam-${docId % 5}", model = s"m-${docId % 7}",
      dateTime = s"2026:0${1 + docId % 9}:15 12:00:00",
      exifW = (1000 + docId % 100).toInt, exifH = (2000 + docId % 50).toInt,
      iso = (100 * (1 + docId % 16)).toInt,
      gps = docId % 3 == 0, littleEndian = docId % 2 == 0))
  }

  /** q55 fixture: a deterministic Ogg audio stream per doc — Vorbis
    * (even d) with rate cycling 44100/48000/32000 by d%3 and granule
    * `(rate/100)(20 + d%30)` (exactly `10(20 + d%30)` ms), or Opus
    * (odd d) with pre-skip `312 + d%100` and granule
    * `preSkip + 4800(10 + d%90)` (exactly `100(10 + d%90)` ms);
    * channels `1 + (d%6)/3`, `3 + d%5` audio pages after the two header
    * pages, and every fourth Vorbis doc carries a >255-byte setup packet
    * (continuation lacing). Pages wear REAL Ogg CRCs; audio packets are
    * zeroed — the walk reads granules and ident headers only, and
    * sample decode is exactly what [[graft.functions.Ogg]] honestly
    * does NOT do. */
  def oggBytes(docId: Long): Array[Byte] = {
    import graft.functions.Ogg
    val ch = (1 + (docId % 6) / 3).toInt
    if (docId % 2 == 0) {
      val rate = Seq(44100, 48000, 32000)((docId % 3).toInt)
      Ogg.encodeStream("vorbis", ch, rate, preSkip = 0,
        granuleEnd = (rate / 100).toLong * (20 + docId % 30),
        audioPages = (3 + docId % 5).toInt,
        bigSetup = docId % 4 == 0)
    } else {
      val preSkip = (312 + docId % 100).toInt
      Ogg.encodeStream("opus", ch, rate = 48000, preSkip = preSkip,
        granuleEnd = preSkip + 4800L * (10 + docId % 90),
        audioPages = (3 + docId % 5).toInt)
    }
  }

  /** q56 fixture: a deterministic Matroska/WebM EBML tree per doc —
    * doc type webm/matroska by d-parity, duration `5000 + 250(d%37)` ms
    * (float, 8-byte form when d%3=0), video codec cycling
    * V_VP8/V_VP9/V_AV1/V_MPEG4 by d%4 at `320+16(d%20)`×`180+2(d%50)`,
    * audio A_OPUS/A_VORBIS with rate cycling by d%3 and `1 + d%2`
    * channels, and the all-ones unknown Segment size (live-muxed shape)
    * on every fifth doc. Blocks are an empty Cluster — the walk reads
    * headers only, and block decode is exactly what
    * [[graft.functions.Mkv]] honestly does NOT do. */
  def mkvBytes(docId: Long): Array[Byte] = {
    import graft.functions.Mkv
    Mkv.encode(
      docType = if (docId % 2 == 0) "webm" else "matroska",
      durationMs = (5000 + 250 * (docId % 37)).toDouble,
      video = Some(Mkv.VideoTrack(
        Seq("V_VP8", "V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")((docId % 4).toInt),
        (320 + 16 * (docId % 20)).toInt,
        (180 + 2 * (docId % 50)).toInt)),
      audio = Some(Mkv.AudioTrack(
        if (docId % 2 == 0) "A_OPUS" else "A_VORBIS",
        Seq(48000, 44100, 32000)((docId % 3).toInt),
        (1 + docId % 2).toInt)),
      unknownSegmentSize = docId % 5 == 0,
      wideDuration = docId % 3 == 0)
  }

  /** q58 fixture: a deterministic HEIF/AVIF still per doc — brand/codec
    * avif+av01 (even) / heic+hvc1 (odd), `64+4(d%50)`×`48+2(d%60)` via
    * ispe, rotation `90·(d%4)` via irot (index 3 in ipco — a free decoy
    * sits at 2), an Exif item on every third doc (has_exif, the
    * PII-scrub signal). Wire variants that must not move any output:
    * 32-bit pitm (d%5=0), 15-bit ipma indices (d%7=0). Item payloads
    * are zeroed — still DECODE (av01/hvc1) is exactly what
    * [[graft.functions.Heif]] honestly does NOT do. */
  def heifBytes(docId: Long): Array[Byte] = {
    import graft.functions.Heif
    Heif.encode(
      brand = if (docId % 2 == 0) "avif" else "heic",
      codec = if (docId % 2 == 0) "av01" else "hvc1",
      w = (64 + 4 * (docId % 50)).toInt,
      h = (48 + 2 * (docId % 60)).toInt,
      rotationQuarter = (docId % 4).toInt,
      withExif = docId % 3 == 0,
      v1Pitm = docId % 5 == 0,
      wideIpma = docId % 7 == 0)
  }

  /** q60 fixture: a deterministic real PDF per doc. Pages `1+d%9`;
    * version `1.(4+d%4)`; xref form cycles by d%3 — cross-reference
    * STREAM (0; packed into a compressed ObjStm with an indirect
    * /Length on d%6=0, PNG Up predictor on even d), classic TABLE (1),
    * table + INCREMENTAL update whose newer catalog adds OpenAction JS
    * (2 — newest-entry-wins is observable). Scrub signals: /Encrypt on
    * d%5=0, OpenAction JS on d%7=0, name-tree JS on d%11=0, embedded
    * files on d%13=0 — so has_js = (d%7=0 | d%11=0 | d%3=2). Content
    * decode (text/fonts/images) is exactly what
    * [[graft.functions.Pdf]] honestly does NOT do. */
  def pdfBytes(docId: Long): Array[Byte] =
    graft.functions.Pdf.encode(graft.functions.Pdf.EncodeSpec(
      versionMinor = (4 + docId % 4).toInt,
      nPages = (1 + docId % 9).toInt,
      encrypted = docId % 5 == 0,
      jsOpenAction = docId % 7 == 0,
      jsNames = docId % 11 == 0,
      attachments = docId % 13 == 0,
      form = (docId % 3) match {
        case 0 => if (docId % 6 == 0) "objstm" else "stream"
        case 1 => "table"
        case _ => "incremental"
      },
      predictor = docId % 2 == 0))

  /** q61 fixture: a deterministic WARC archive per doc. Version cycles
    * `1.1`/`1.0` by d%2 (the 1.0 form also exercises the `<>`-wrapped
    * Target-URI); per-record-gzip-member compression on d%3=0; records
    * are warcinfo + request + response, plus metadata on d%5=0 and a
    * revisit on d%7=0 → n_records = 3 + those two. The response is a
    * real HTTP/1.1 message: status 404 on d%13=0 else 200, Content-Type
    * cycles 4 families by d%4, payload `10+d%90` bytes. Every response
    * carries a WARC-Payload-Digest; on d%17=0 it is CORRUPTED (one
    * base32 char flipped) so digest_ok=false proves the sha1/base32
    * verification actually runs. All closed-form for the oracle. */
  def warcBytes(docId: Long): Array[Byte] = {
    import graft.functions.Warc
    val d = docId
    val version = if (d % 2 == 0) "1.1" else "1.0"
    val uri = s"https://host-${d % 9}.test/page/$d"
    val payload = Array.fill((10 + d % 90).toInt)('x'.toByte)
    val status = if (d % 13 == 0) 404 else 200
    val ctype = (d % 4) match {
      case 0 => "text/html"
      case 1 => "image/png"
      case 2 => "application/json"
      case _ => "text/plain"
    }
    val goodDigest = Warc.sha1Digest(payload)
    val digest =
      if (d % 17 == 0) {
        // flip the first base32 char to a different one: wrong, same shape
        val tail = goodDigest.substring(5)
        val flipped = if (tail.head == 'A') 'B' else 'A'
        "sha1:" + flipped + tail.substring(1)
      } else goodDigest
    def rid(i: Int) = s"urn:uuid:00000000-0000-4000-8000-${"%08d".format(d)}$i"
    val date = f"2026-08-19T00:00:${d % 60}%02dZ"
    val recs = Vector.newBuilder[(Warc.RecordSpec, String, String)]
    recs += ((Warc.RecordSpec("warcinfo", None,
      "software: graft\r\nformat: WARC file version ".getBytes("US-ASCII") ++
        version.getBytes("US-ASCII"),
      "application/warc-fields"), rid(0), date))
    recs += ((Warc.RecordSpec("request", Some(uri),
      Warc.httpRequestBlock(s"/page/$d", s"host-${d % 9}.test"),
      "application/http;msgtype=request"), rid(1), date))
    recs += ((Warc.RecordSpec("response", Some(uri),
      Warc.httpResponseBlock(status, ctype, payload),
      "application/http;msgtype=response",
      Vector("WARC-Payload-Digest" -> digest)), rid(2), date))
    if (d % 5 == 0)
      recs += ((Warc.RecordSpec("metadata", Some(uri),
        "fetchTimeMs: 5\r\n".getBytes("US-ASCII"),
        "application/warc-fields"), rid(3), date))
    if (d % 7 == 0)
      recs += ((Warc.RecordSpec("revisit", Some(uri), Array.emptyByteArray,
        "message/http",
        Vector("WARC-Profile" ->
          "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest")),
        rid(4), date))
    Warc.encode(version, recs.result(), gzipPerRecord = d % 3 == 0)
  }

  /** q62 fixture: a deterministic DOCX per doc. `1+d%6` paragraphs of
    * `2+d%5` words; title `Doc d`, creator `author-(d%9)`;
    * `word/document.xml` STORED on even d, DEFLATE on odd (both unzip
    * paths run); ZIP64 structures (EOCD64 + locator + saturated central
    * fields) on d%13=0 — the streamed-writer shape; scrub signals:
    * `word/vbaProject.bin` on d%11=0 (has_macros) and a
    * TargetMode="External" attachedTemplate relationship on d%7=0
    * (has_external_ref). n_entries = 6 + macros. All closed-form. */
  def docxBytes(docId: Long): Array[Byte] =
    graft.functions.Zip.encodeDocx(graft.functions.Zip.DocxSpec(
      nParagraphs = (1 + docId % 6).toInt,
      wordsPerPara = (2 + docId % 5).toInt,
      title = s"Doc $docId",
      creator = s"author-${docId % 9}",
      macros = docId % 11 == 0,
      externalRef = docId % 7 == 0,
      storedDocument = docId % 2 == 0,
      zip64 = docId % 13 == 0))

  /** q66 fixture: a deterministic WebDataset tar shard per doc.
    * `1+d%4` samples, each `{key}.png` (`10+d%30` bytes) + `{key}.txt`
    * (`3+d%6` chars); on odd d the keys live under a >100-char
    * directory so every entry exercises the GNU longname path. All
    * closed-form for the oracle. */
  def wdsBytes(docId: Long): Array[Byte] = {
    val d = docId
    val n = (1 + d % 4).toInt
    val dir = if (d % 2 == 1) "deep/" + ("p" * 120) else "shard"
    val items = Vector.newBuilder[(String, Array[Byte])]
    for (i <- 0 until n) {
      val key = f"$dir/s$i%05d"
      val img = Array.tabulate((10 + d % 30).toInt)(j =>
        ((d + i * 7 + j) % 256).toByte)
      items += ((key + ".png", img))
      items += ((key + ".txt",
        ("c" * (3 + d % 6).toInt).getBytes("UTF-8")))
    }
    graft.functions.Tar.encode(items.result())
  }

  /** q67 fixture: a deterministic ADTS/AAC chain per doc. Profile
    * cycles all four (d%4), sample-rate index d%9 (96k..16k), channel
    * config `1+d%5`, `3+d%6` frames of varying payload size (the chain
    * walk must follow per-frame lengths), CRC header shape on d%5=0.
    * All closed-form for the oracle. */
  def aacBytes(docId: Long): Array[Byte] = {
    val d = docId
    val n = (3 + d % 6).toInt
    graft.functions.Aac.encode(
      profile = (d % 4).toInt,
      srIdx = (d % 9).toInt,
      channels = (1 + d % 5).toInt,
      payloadLens = Vector.tabulate(n)(i => (20 + (d + i * 3) % 50).toInt),
      withCrc = d % 5 == 0)
  }

  /** q68 fixture: an Annex-B H.264 stream per doc — an AUD NAL then the
    * SPS (the scan must skip non-SPS NALs). Even display dims so the
    * 4:2:0 crop units divide: width `160+2*(d%120)`, height
    * `180+2*(d%100)` — most are NOT macroblock-aligned, so the
    * frame-cropping arithmetic is load-bearing. Level `30+d%21`. */
  def h264Bytes(docId: Long): Array[Byte] = {
    val d = docId
    val aud = Array[Byte](0, 0, 0, 1, 0x09, 0xf0.toByte)
    aud ++ graft.functions.H264.encodeSps(
      width = (160 + 2 * (d % 120)).toInt,
      height = (180 + 2 * (d % 100)).toInt,
      levelIdc = (30 + d % 21).toInt)
  }

  /** q69 fixture: an IVF container per doc. Codec fourcc cycles
    * vp80/vp90/av01 by d%3; `2+d%7` frames at pts 0..n-1, timebase
    * 1/30; on d%6=0 the DECLARED frame count lies (n+1) — the walked
    * chain is the truth and counts_agree must be false there. */
  def ivfBytes(docId: Long): Array[Byte] = {
    val d = docId
    val n = (2 + d % 7).toInt
    val fourcc = (d % 3) match {
      case 0 => "VP80"
      case 1 => "VP90"
      case _ => "AV01"
    }
    graft.functions.Ivf.encode(fourcc,
      width = (320 + 2 * (d % 200)).toInt,
      height = (180 + 2 * (d % 150)).toInt,
      den = 30, num = 1,
      frameSizes = Vector.tabulate(n)(i => (5 + (d + i) % 40).toInt),
      declared = if (d % 6 == 0) n + 1 else n)
  }

  /** q70 fixture: an IVF-wrapped VP9 stream per doc whose FIRST frame
    * carries a real profile-0 keyframe header (sync code, color config,
    * 16-bit dims). On d%5=0 the CONTAINER header LIES about width
    * (+16) — container_agrees must go false and the bitstream dims win.
    * Color space cycles 1..5 (never RGB=7, which profile 0 forbids). */
  def ivfVp9Bytes(docId: Long): Array[Byte] = {
    val d = docId
    val w = (176 + 2 * (d % 160)).toInt
    val h = (144 + 2 * (d % 120)).toInt
    val lieW = if (d % 5 == 0) w + 16 else w
    val header = graft.functions.Ivf.encode("VP90", lieW, h, 30, 1,
      Vector(), declared = 2)
    val kf = graft.functions.Vp9.encodeKeyframeHeader(w, h,
      colorSpace = (1 + d % 5).toInt) ++
      Array.fill((10 + d % 20).toInt)(0x55.toByte) // compressed-data tail
    val inter = Array.fill(8)((1 + d % 250).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    for ((payload, pts) <- Seq((kf, 0), (inter, 1))) {
      val fh = new Array[Byte](12)
      fh(0) = (payload.length & 0xff).toByte
      fh(1) = ((payload.length >> 8) & 0xff).toByte
      fh(2) = ((payload.length >> 16) & 0xff).toByte
      fh(4) = (pts & 0xff).toByte
      out.write(fh)
      out.write(payload)
    }
    out.toByteArray
  }

  /** q71 fixture: an IVF-wrapped AV1 stream per doc whose first frame
    * is a temporal delimiter + sequence-header OBU. Header shape
    * alternates by d%2 (reduced still-picture vs full with one
    * operating point); dims `128+2*(d%180)` × `96+2*(d%140)` (their
    * variable bit-widths exercise frame_width_bits); level `d%24`;
    * the container lies about height on d%7=0. */
  def ivfAv1Bytes(docId: Long): Array[Byte] = {
    val d = docId
    val w = (128 + 2 * (d % 180)).toInt
    val h = (96 + 2 * (d % 140)).toInt
    val lieH = if (d % 7 == 0) h + 32 else h
    val header = graft.functions.Ivf.encode("AV01", w, lieH, 30, 1,
      Vector(), declared = 1)
    val seq = graft.functions.Av1.encodeSeqObu(
      profile = (d % 3).toInt, levelIdx = (d % 24).toInt,
      width = w, height = h, reduced = d % 2 == 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    val fh = new Array[Byte](12)
    fh(0) = (seq.length & 0xff).toByte
    fh(1) = ((seq.length >> 8) & 0xff).toByte
    out.write(fh)
    out.write(seq)
    out.toByteArray
  }

  /** q59 fixture: a deterministic SVG per doc. Sizing source cycles by
    * d%4 — viewBox-only (0), bare numbers (1), `px` (2), `pt` at exact
    * 4/3 multiples (3: `3k pt` = `4k px`); `1+d%4` rect elements; a
    * `<script>` element on every third doc and an `onclick` attribute
    * on every seventh (has_script — the stored-XSS scrub signal); an
    * external `<image href>` on every fifth (has_external_ref — the
    * tracking-pixel shape). All closed-form for the DuckDB oracle. */
  def svgBytes(docId: Long): Array[Byte] = {
    val w = 100 + (docId % 200)
    val h = 50 + (docId % 150)
    val dims = (docId % 4) match {
      case 0 => ""
      case 1 => s""" width="$w" height="$h""""
      case 2 => s""" width="${w}px" height="${h}px""""
      case _ => s""" width="${3 * (25 + docId % 60)}pt" height="${3 * (15 + docId % 40)}pt""""
    }
    val rects = (0 until (1 + docId % 4).toInt).map { k =>
      val on = if (k == 0 && docId % 7 == 0) """ onclick="poke()"""" else ""
      s"""  <rect x="${k * 4}" y="1" width="3" height="3"$on/>"""
    }.mkString("\n")
    val script = if (docId % 3 == 0) "\n  <script>poke()</script>" else ""
    val ext =
      if (docId % 5 == 0)
        s"""\n  <image href="https://cdn.site-${docId % 7}.test/px.png" width="1" height="1"/>"""
      else ""
    (s"""<?xml version="1.0" encoding="UTF-8"?>
        |<!-- doc $docId -->
        |<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 $w $h"$dims>
        |$rects$script$ext
        |</svg>
        |""".stripMargin).getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  final case class PageRow(
      url: String, host: String, status: Int, contentType: String,
      content: String, links: Seq[String], navLinks: Seq[String],
      imageRefs: Seq[String], fetchMethod: String, loadMs: Long)

  def webGraphDF(spark: SparkSession, p: Params): DataFrame = {
    import spark.implicits._
    val offsets = hostOffsets(p)
    spark.range(totalPages(p)).as[Long].map { g =>
      var h = 0
      while (h + 1 <= p.hosts - 1 && g >= offsets(h + 1)) h += 1
      val j = (g - offsets(h)).toInt
      val pg = page(p, h, j)
      PageRow(pg.url, hostName(h), pg.status, pg.contentType, pg.content,
        pg.links, pg.navLinks, pg.imageRefs, pg.fetchMethod, pg.loadMs)
    }.toDF()
  }

  def robotsMap(p: Params): Map[String, graft.operators.Robots.Policy] =
    (0 until p.hosts).map(h => hostName(h) -> graft.operators.Robots.parse(robotsTxt(h))).toMap

  /** THE fixture-engine harness (q29, `SparkEntry.entry`, and the bench's
    * engine kernel all drive the same shape): temp parquet state, CACHED
    * web/image frames — uncached, every epoch's scans re-encode all
    * fixture images — and a guaranteed unpersist even when `use` throws.
    * One copy keeps the cache/unpersist discipline uniform. */
  def withFixtureEngine[T](spark: SparkSession, p: Params,
      cfg: graft.model.CrawlConfig, tmpPrefix: String)
      (use: graft.epoch.CrawlEngine => T): T = {
    val io = new graft.sources.ParquetSnapshotTableIO(
      spark, graft.util.TempDirs.create(tmpPrefix))
    val web = webGraphDF(spark, p).cache()
    val imgs = imagesDF(spark, p).cache()
    val engine = new graft.epoch.CrawlEngine(spark, cfg,
      new graft.sources.FixtureFetcher(web), imgs, io, robotsMap(p))
    try use(engine)
    finally { web.unpersist(); imgs.unpersist() }
  }
}
