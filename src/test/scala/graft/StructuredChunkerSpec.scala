package graft

import graft.operators.{Chunker, Cleanup, Structured}

/** Unit coverage for the D5 block parser and C9 chunker beyond the
  * driver-oracle shapes (q31/q32/q33): standalone code, role=main region,
  * size-based chunk fallback with overlap, classifier decision order. */
class StructuredChunkerSpec extends SparkSpec {

  test("structured: main-content priority and title") {
    val html = "<html><head><title> My  Doc </title></head><body>" +
      "<p>outside paragraph body</p>" +
      "<main><h2>In Main</h2><p>inside</p></main></body></html>"
    assert(Structured.title(html).contains("My  Doc")) // bs4 strips ends only
    val blocks = Structured.parseBlocks(html)
    assert(blocks.map(_.blockType) == Seq("heading", "paragraph"))
    assert(blocks.head.content == "In Main" && blocks.head.level.contains(2))
  }

  test("structured: comments are invisible (no decoy blocks/title, no early region close)") {
    // BeautifulSoup parity: commented-out markup must not parse
    val html = "<html><head><!-- <title>Decoy</title> --><title>Real</title>" +
      "</head><body><main><!-- </main> --><h2>Kept</h2>" +
      "<!-- <h1>Ghost</h1><img src=\"ghost.png\"> --><p>tail</p></main>" +
      "<p>outside</p></body></html>"
    assert(Structured.title(html).contains("Real"))
    val blocks = Structured.parseBlocks(html)
    assert(blocks.map(_.blockType) == Seq("heading", "paragraph"))
    assert(blocks.map(_.content) == Seq("Kept", "tail"))
  }

  test("structured: all seven block types in document order") {
    val html = """<body><h3>T</h3><p>para text</p>
      <pre><code class="lang language-py">x = 1</code></pre>
      <code>inline()</code>
      <table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>
      <ol><li>first</li><li>second</li></ol>
      <blockquote><p>line one</p><p>line two</p></blockquote>
      <img src="pic.png" alt="a pic"/><img src="" alt="dropped"/></body>"""
    val b = Structured.parseBlocks(html)
    assert(b.map(_.blockType) ==
      Seq("heading", "paragraph", "code", "code", "table", "list", "blockquote", "image"))
    assert(b(2).language.contains("py") && b(2).content == "x = 1")
    assert(b(3).content == "inline()" && b(3).language.isEmpty)
    assert(b(4).content == """[["a","b"],["1","2"]]""")
    assert(b(5).content == "first\nsecond")
    assert(b(6).content == "line one\nline two")
    assert(b(7).content == "pic.png" && b(7).alt.contains("a pic"))
  }

  test("structured: role=main region spans the whole element; data-src not mistaken for src") {
    val html = "<html><body><p>outside</p>" +
      "<div role='main'><p>first para</p><p>second para</p><h2>Late</h2></div></body></html>"
    val b = Structured.parseBlocks(html)
    // a lazy close-on-any-tag regex would truncate after "first para"
    assert(b.map(_.blockType) == Seq("paragraph", "paragraph", "heading"))
    assert(b(1).content == "second para" && b(2).content == "Late")
    val img = Structured.parseBlocks(
      "<body><img data-src='lazy.gif' src='real.png' alt='x'/></body>")
    assert(img.head.content == "real.png")
  }

  test("structured: nested same-name BLOCKS close depth-balanced, not at the first inner close") {
    // BeautifulSoup recursion parity: a ul-in-ul (or table-in-table) must
    // not truncate the outer block at the INNER close and leak stray
    // markup as phantom blocks
    val html = "<html><body><main>" +
      "<ul><li>outer a<ul><li>inner x</li><li>inner y</li></ul></li>" +
      "<li>outer b</li></ul>" +
      "<table><tr><td><table><tr><td>nested cell</td></tr></table></td></tr>" +
      "<tr><td>outer cell</td></tr></table>" +
      "<p>tail</p></main></body></html>"
    val blocks = Structured.parseBlocks(html)
    assert(blocks.map(_.blockType) == Seq("list", "table", "paragraph"),
      s"got ${blocks.map(b => (b.blockType, b.content))}")
    // the outer list block covers BOTH outer items (inner list content is
    // within the block, not spilled after it)
    assert(blocks.head.content.contains("outer b"))
    // the table block reaches its balanced close: the outer row survives
    assert(blocks(1).content.contains("outer cell"))
    assert(blocks.last.content == "tail")
  }

  test("structured: nested same-tag elements inside role=main; attr keeps the other quote") {
    // <div> nested inside <div role=main> — a lazy (.*?)</div> would stop
    // at the INNER close and drop everything after the first child
    val html = "<html><body><p>outside</p><div role='main'>" +
      "<div class='hero'><p>hero text</p></div>" +
      "<p>after nested</p><table><tr><td>cell</td></tr></table></div>" +
      "<p>trailing outside</p></body></html>"
    val b = Structured.parseBlocks(html)
    assert(b.map(_.blockType) == Seq("paragraph", "paragraph", "table"),
      s"nested-div truncation: $b")
    assert(b(0).content == "hero text" && b(1).content == "after nested")
    // attribute values keep the OTHER quote character intact
    val img = Structured.parseBlocks(
      """<body><img src="a.png" alt="dog's toy"/></body>""")
    assert(img.head.alt.contains("dog's toy"))
  }

  test("structured: table JSON escapes control characters; null inputs are safe") {
    val b = Structured.parseBlocks(
      "<body><table><tr><td>line\nbreak</td><td>tab\there</td></tr></table></body>")
    val json = b.head.content
    assert(json == "[[\"line\\u000abreak\",\"tab\\u0009here\"]]")
    // valid JSON end to end
    assert(!json.contains("\n") && !json.contains("\t"))
    assert(Structured.parseBlocks("<body></body>").isEmpty)
    // null html/markdown rows flow through the UDF surfaces without NPE
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("u1", null: String)).toDF("url", "html")
    assert(Structured.toStructured(df, col("url"), col("html"))
      .selectExpr("size(blocks)").as[Int].head() == 0)
    assert(Chunker.chunks(df, col("url"), col("html")).count() == 0)
    assert(Cleanup.classifyChunk(null) == "skip")
  }

  test("chunker: size-based fallback with 200-char overlap and 50-char gate") {
    // no headings → size path; paragraph boundary preferred
    val para = ("alpha beta gamma delta " * 12).trim // ~275 chars
    val text = (1 to 30).map(i => s"p$i $para").mkString("\n\n") // ~8.5k chars
    val chunks = Chunker.chunkMarkdown(text, chunkSize = 3000)
    assert(chunks.length >= 3)
    assert(chunks.forall(_.length <= 3000))
    assert(chunks.forall(_.length >= 50))
    // overlap duplicates ~200 chars per boundary → total exceeds the input
    val joined = chunks.mkString
    assert(joined.length > text.length, "no overlap duplication observed")
    assert(chunks.head.startsWith("p1 ") && text.endsWith(chunks.last.takeRight(40)))
  }

  test("chunker: heading sections subdivide when oversized; tiny fragments dropped") {
    val big = "# A\n\n" + ("word " * 1500) + "\n\n# B\n\nshort but fifty characters of body text here okay"
    val chunks = Chunker.chunkMarkdown(big, chunkSize = 3000)
    assert(chunks.length >= 3) // section A subdivided, B kept
    assert(chunks.last.startsWith("# B"))
    val tiny = "# A\n\ntiny\n\n# B\n\nalso tiny"
    // every section < 50 chars → heading pass yields nothing → size path
    val fallback = Chunker.chunkMarkdown(tiny, chunkSize = 3000)
    assert(fallback == Seq("# A\n\ntiny\n\n# B\n\nalso tiny"))
  }

  test("chunker: code fences mask heading-like lines") {
    val md = "# Real\n\n" + ("x" * 60) + "\n\n```\n# not a heading\n```\n\n## Also real\n\n" + ("y" * 60)
    val chunks = Chunker.chunkMarkdown(md, chunkSize = 100)
    assert(chunks.exists(_.startsWith("# Real")))
    assert(chunks.exists(_.startsWith("## Also real")))
    assert(!chunks.exists(_.startsWith("# not")))
  }

  test("property: chunker invariants on random markdown (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "prose", "docs")
    def randDoc(): String = {
      val blocks = (1 to (2 + rnd.nextInt(8))).map { _ =>
        rnd.nextInt(4) match {
          case 0 => "#" * (1 + rnd.nextInt(3)) + " Heading " + rnd.nextInt(100)
          case 1 => "```\n# fake heading inside fence\ncode " + rnd.nextInt(100) + "\n```"
          case _ => (1 to (20 + rnd.nextInt(200))).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
        }
      }
      blocks.mkString("\n\n")
    }
    (1 to 60).foreach { _ =>
      val doc = randDoc()
      val size = 400 + rnd.nextInt(1200)
      val chunks = Chunker.chunkMarkdown(doc, chunkSize = size)
      // invariants: every chunk within size (heading sections may only
      // exceed if they were already subdivided -> never above size),
      // nothing below the 50-char floor unless it is the sole chunk,
      // deterministic across calls
      chunks.foreach(c => assert(c.length <= math.max(size, doc.length),
        s"chunk ${c.length} > $size"))
      if (chunks.length > 1) chunks.foreach(c => assert(c.length >= 50))
      assert(chunks == Chunker.chunkMarkdown(doc, chunkSize = size))
      // no chunk starts inside a code fence's fake heading
      assert(!chunks.exists(_.startsWith("# fake heading")))
    }
  }

  test("noise split: convert keeps fast-path text; removeNoise strips the selector set") {
    import graft.sources.HtmlToMarkdown
    val html = "<html><body><div class='x sidebar'>side links</div>" +
      "<span role='banner'>big banner</span>" +
      "<div class='breadcrumb'>home / docs</div>" +
      "<p>real content stays</p>" +
      "<div class='content-like'>also stays</div></body></html>"
    // fast path = markdownify strip ONLY (script/style/nav/footer,
    // page.py:39-45): class/role noise SURVIVES, exactly like the
    // reference's http_fast markdown — stripping it here would diverge
    // content hashes (J2) from the reference
    val md = HtmlToMarkdown.convert(html)
    assert(md.contains("real content stays") && md.contains("also stays"))
    assert(md.contains("side links") && md.contains("big banner") &&
      md.contains("home / docs"))
    // heavy-path DOM pre-clean (_remove_noise, page.py:181-199): the full
    // NOISE_SELECTORS list goes; class-token decoys (content-like) stay
    val cleaned = HtmlToMarkdown.convert(HtmlToMarkdown.removeNoise(html))
    assert(cleaned.contains("real content stays") && cleaned.contains("also stays"))
    assert(!cleaned.contains("side links") && !cleaned.contains("big banner") &&
      !cleaned.contains("home / docs"))
  }

  test("Postprocess: chunk + classify + cleaner gated off skip chunks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Postprocess
    val pages = Seq(
      ("u1", "short clean text of sufficient length for one chunk here ok"),
      ("u2", "cookie privacy policy " + ("words " * 30)),
      ("u3", "# A\n\n" + ("body words " * 300) + "\n\n# B\n\n" + ("more words " * 300)))
      .toDF("url", "md")
    val marker = new Postprocess.ChunkCleaner {
      override def clean(c: String, lvl: String): String = s"[$lvl] $c"
    }
    val rows = Postprocess.chunksTable(pages, col("url"), col("md"), marker)
      .as[(String, Int, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val u1 = rows("u1")
    assert(u1.length == 1 && u1.head._3 == "skip" && !u1.head._4.startsWith("["))
    val u2 = rows("u2")
    assert(u2.head._3 == "cleanup" && u2.head._4.startsWith("[cleanup] "))
    val u3 = rows("u3")
    assert(u3.length >= 2, s"semantic split expected, got ${u3.length}")
    assert(u3.forall(r => r._3 != "skip" && r._4.startsWith("[")))
    assert(u3.head._4.contains("# A") && u3.last._4.contains("# B"))
  }

  test("cleanup classifier: decision order and edge gates") {
    assert(Cleanup.classifyChunk("```\ncode\n```") == "skip") // density 1.0
    assert(Cleanup.classifyChunk("short clean text") == "skip")
    assert(Cleanup.classifyChunk("short with cookie banner") == "cleanup")
    val long = "filler words here " * 150 // > 2000 chars
    assert(Cleanup.classifyChunk(long) == "cleanup")
    assert(Cleanup.classifyChunk("|a|b|\n|c|d|\n" + long) == "heavy")
    assert(Cleanup.classifyChunk("|a|b|\n|---|---|\n|c|d|\n" + long) == "cleanup") // separator present
    assert(Cleanup.classifyChunk("$x^2 + y$ " + long) == "heavy")
    assert(Cleanup.classifyChunk("price $9.99 only " + long) == "cleanup") // price, not latex
    assert(Cleanup.classifyChunk("\\frac{a}{b} " + long) == "heavy")
  }
}
