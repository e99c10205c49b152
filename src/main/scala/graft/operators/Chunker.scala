package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C9 — markdown chunking for LLM processing, transcribed from the
  * reference (`src/scraper/markdown.py:13-211`): pre-clean (noise lines,
  * CSS/JS blocks, blank-line collapse) → semantic H1-H3 heading splits
  * (PR 2.1, code fences masked, ≥2 headings required, <50-char fragments
  * dropped, oversize sections subdivided) → size-based fallback (6000-char
  * chunks, 200 overlap, paragraph/newline boundary preference).
  *
  * O3/O4 — the 3-tier cleanup classifier (`src/llm/cleanup.py:39-141`):
  * skip (mostly code, or short without noise) / cleanup / heavy (broken
  * tables or LaTeX), computed as a COLUMN before any expensive downstream
  * stage so the heavy path touches only rows that need it.
  */
object Chunker {

  final val DefaultChunkSize = 6000 // markdown.py:13 (CONS-011 fix)
  final val ChunkOverlap = 200

  private val NoisePatterns = Seq(
    "(?i)self\\.__next_[a-zA-Z_]*",
    "document\\.querySelectorAll\\([^)]*\\)",
    "document\\.getElementById\\([^)]*\\)",
    "window\\.addEventListener\\([^)]*\\)",
    "data-page-mode\\s*=",
    "suppressHydrationWarning").map(_.r)

  // Python-\s class, NOT Java's ASCII \s: the reference compiles these
  // with Unicode str semantics, so an NBSP-prefixed " On this page"
  // is still a noise line there (Hashing.PyWs is the shared class)
  private val Ws = s"[${graft.functions.Hashing.PyWs}]"
  private val NoiseLinePatterns = Seq(
    s"(?i)^$Ws*On this page$Ws*$$",
    s"(?i)^$Ws*Edit this page$Ws*$$",
    s"(?i)^$Ws*Was this page helpful\\??$Ws*$$",
    s"(?i)^$Ws*Last updated$Ws*(on$Ws+)?[\\d/\\-]+$Ws*$$",
    s"(?i)^$Ws*Skip to (main )?content$Ws*$$",
    s"(?i)^$Ws*Table of contents?$Ws*$$",
    s"(?i)^$Ws*Previous$Ws*$$",
    s"(?i)^$Ws*Next$Ws*$$").map(_.r)

  private val HeadingRe = "(?m)^(#{1,3})\\s+".r
  private val CodeFenceRe = "(?s)```.*?```".r

  /** Python-whitespace membership table (chars ≤ U+3000 — the whole PyWs
    * set) for the hand-rolled strip below. */
  private val PyWsSet: Array[Boolean] = {
    val a = new Array[Boolean](0x3001)
    graft.functions.Hashing.PyWs.foreach(c => a(c) = true)
    a
  }
  @inline private def isPyWs(c: Char): Boolean = c <= 0x3000 && PyWsSet(c)

  /** str.strip() with Python's whitespace set — a two-pointer scan, not a
    * regex replaceAll: pyStrip runs per LINE in preClean and per chunk in
    * chunkBySize, and the matcher allocation + anchored scan was a
    * measured chunk of the ~1.5 ms/doc preClean cost (round 6, guide
    * §1.2). Identical result to the old `^[ws]+|[ws]+$` replaceAll. */
  private def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPyWs(s.charAt(i))) i += 1
    while (j > i && isPyWs(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** Case-insensitive contains for the noise-pattern prefilter. */
  private def containsIc(line: String, needle: String): Boolean = {
    val n = needle.length
    var i = 0
    val max = line.length - n
    while (i <= max) {
      if (line.regionMatches(true, i, needle, 0, n)) return true
      i += 1
    }
    false
  }

  /** `_pre_clean_markdown` (markdown.py:39-74). Round 6: the per-line
    * regex sweeps are gated by cheap literal prefilters — every
    * NoisePattern requires one of five literal substrings, and every
    * NoiseLinePattern matches only short fixed phrases (the sole
    * unbounded one starts "Last updated") — so a typical content line
    * runs zero regexes. The regexes stay the source of truth: a
    * prefilter hit still confirms against the original pattern, so
    * classification is bit-identical. */
  def preClean(text: String): String = {
    val cleaned = scala.collection.mutable.ArrayBuffer.empty[String]
    var inNoiseBlock = false
    text.split("\n", -1).foreach { line =>
      val stripped = pyStrip(line) // Python str.strip(): Unicode whitespace
      // NoisePatterns each demand a literal: self.__next_ (ci) /
      // document. / window. / data-page-mode / suppressHydrationWarning
      def mayNoise: Boolean =
        line.contains("document.") || line.contains("window.") ||
          line.contains("data-page-mode") ||
          line.contains("suppressHydrationWarning") ||
          containsIc(line, "self.__next_")
      // NoiseLinePatterns are whole-line fixed phrases ≤ a few dozen
      // chars once stripped; only the "Last updated <date>" form can
      // exceed that, and it must start with its literal
      def mayNoiseLine: Boolean =
        stripped.nonEmpty && (stripped.length <= 64 ||
          stripped.regionMatches(true, 0, "Last updated", 0, 12))
      if (stripped == "{" && !inNoiseBlock) inNoiseBlock = true
      else if (inNoiseBlock) {
        if (stripped == "}" || stripped == "};") inNoiseBlock = false
      } else if (mayNoise && NoisePatterns.exists(_.findFirstIn(line).isDefined)) ()
      else if (mayNoiseLine && NoiseLinePatterns.exists(_.findFirstIn(line).isDefined)) ()
      else cleaned += line
    }
    pyStrip(cleaned.mkString("\n").replaceAll("\\n{3,}", "\n\n"))
  }

  /** `_mask_code_blocks` — same positions, fence content blanked. */
  def maskCodeBlocks(text: String): String =
    CodeFenceRe.replaceAllIn(text, m => " " * (m.end - m.start))

  /** `_chunk_by_size` (markdown.py:136-173): paragraph boundary, then
    * newline, then hard split; CHUNK_OVERLAP between chunks; <50-char
    * fragments dropped. */
  // NOTE: slicing is UTF-16-unit-based (Java String indexing) where the
  // reference slices by code points — identical for BMP text; for
  // astral-heavy pages (>6000 cps with emoji/CJK-ext) chunk WINDOWS can
  // differ slightly, though boundaries still snap to the same paragraph/
  // newline breaks. Classification thresholds already count code points.
  def chunkBySize(text: String, chunkSize: Int = DefaultChunkSize): Seq[String] = {
    if (text.length <= chunkSize)
      return if (text.length >= 50) Seq(text)
      else if (pyStrip(text).nonEmpty) Seq(text) else Seq.empty
    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = 0
    while (cur < text.length) {
      var end = math.min(cur + chunkSize, text.length)
      if (end < text.length) {
        // python rfind(sub, a, b): the whole sub must sit inside [a, b)
        val headingPos = text.lastIndexOf("\n#", end - 2) match {
          case p if p >= cur + chunkSize / 2 => p
          case _ => -1
        }
        if (headingPos > cur) end = headingPos + 1
        else {
          val para = text.lastIndexOf("\n\n", end - 2)
          if (para >= cur && para > cur + chunkSize / 2) end = para + 2
          else {
            val nl = text.lastIndexOf("\n", end - 1)
            if (nl >= cur && nl > cur + chunkSize / 2) end = nl + 1
          }
        }
      }
      val chunk = pyStrip(text.substring(cur, end))
      if (chunk.nonEmpty && chunk.length >= 50) chunks += chunk
      // overlap rewind; the max() guards degenerate chunkSize <= 2·overlap
      // (the reference's 6000/200 defaults make end-200 > cur structurally)
      cur = if (end < text.length) math.max(end - ChunkOverlap, cur + 1) else end
    }
    if (chunks.nonEmpty) chunks.toSeq else Seq(pyStrip(text))
  }

  /** `_chunk_by_headings` (markdown.py:102-133): split at H1-H3 starts
    * (code fences masked), None (→ fallback) when < 2 headings. */
  def chunkByHeadings(text: String, chunkSize: Int = DefaultChunkSize): Option[Seq[String]] = {
    val masked = maskCodeBlocks(text)
    val positions = HeadingRe.findAllMatchIn(masked).map(_.start).toVector
    if (positions.length < 2) return None
    val sections = scala.collection.mutable.ArrayBuffer.empty[String]
    positions.zipWithIndex.foreach { case (start, idx) =>
      val end = if (idx + 1 < positions.length) positions(idx + 1) else text.length
      val section = pyStrip(text.substring(start, end))
      if (section.nonEmpty && section.length >= 50) {
        if (section.length > chunkSize) sections ++= chunkBySize(section, chunkSize)
        else sections += section
      }
    }
    if (sections.nonEmpty) Some(sections.toSeq) else None
  }

  /** `chunk_markdown` (markdown.py:176-211). nativeTokenCount: server-
    * provided count; ≈4 chars/token single-chunk shortcut. */
  def chunkMarkdown(text0: String, chunkSize: Int = DefaultChunkSize,
      nativeTokenCount: Option[Int] = None): Seq[String] = {
    val text = preClean(text0)
    def whole: Seq[String] =
      if (text.length >= 50) Seq(text)
      else if (pyStrip(text).nonEmpty) Seq(text) else Seq.empty
    if (nativeTokenCount.exists(_ * 4 <= chunkSize)) return whole
    if (text.length <= chunkSize) return whole
    // chunkBySize is non-empty on this path (text.length > chunkSize ends
    // at its final `Seq(pyStrip(text))` fallback), so no guard needed
    chunkByHeadings(text, chunkSize).getOrElse(chunkBySize(text, chunkSize))
  }

  // null markdown rows (failed fetches) must not NPE the stage
  private val chunksUdf = udf((t: String) =>
    if (t == null) Seq.empty[String] else chunkMarkdown(t))

  /** DataFrame surface: one row per chunk (id, chunk_idx from 1, chunk). */
  def chunks(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"), posexplode(chunksUdf(textCol)).as(Seq("idx0", "chunk")))
      .select(col("id"), (col("idx0") + 1).cast("int").as("chunk_idx"), col("chunk"))
}

/** O3/O4 — cleanup-level classification (`src/llm/cleanup.py:39-141`). */
object Cleanup {

  private val NoiseIndicators = Seq(
    "cookie", "privacy policy", "terms of service", "subscribe",
    "toggle dark", "toggle light", "dark mode", "light mode",
    "skip to content", "table of contents", "on this page",
    "all rights reserved", "powered by")

  private val CodeBlockRe = "(?s)```.*?```".r
  // (?=\n|\z) not (?m)$: Java's multiline $ matches BEFORE a \r\n
  // terminator while Python's only matches before \n — CRLF markdown must
  // not count rows the reference's regex rejects
  private val TableRowRe = "(?m)^\\|.+\\|(?=\n|\\z)".r
  private val TableSepRe = "(?m)^\\|[\\s\\-:|]+\\|(?=\n|\\z)".r
  private val LatexPatterns = Seq(
    "\\\\frac\\{", "\\\\begin\\{", "\\\\end\\{", "\\\\[a-zA-Z]+\\{",
    "\\$[^$\\d][^$]*\\$").map(_.r)
  private val PriceRe = "\\$\\d+[\\d.,]*".r

  /** Python len() counts CODE POINTS; Java .length counts UTF-16 units —
    * astral-heavy chunks (emoji, CJK extensions) would otherwise cross the
    * reference's thresholds at half the real length. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  def codeDensity(markdown: String): Double =
    if (markdown.isEmpty) 0.0
    else CodeBlockRe.findAllIn(markdown).map(cpLen).sum.toDouble / cpLen(markdown)

  def hasBrokenTables(markdown: String): Boolean = {
    val rows = TableRowRe.findAllIn(markdown).size
    rows >= 2 && TableSepRe.findFirstIn(markdown).isEmpty
  }

  def hasLatex(markdown: String): Boolean = {
    val matches = LatexPatterns.count(_.findFirstIn(markdown).isDefined)
    if (matches == 0) false
    else if (matches == 1 && PriceRe.findFirstIn(markdown).isDefined) false
    else true
  }

  /** skip | cleanup | heavy — identical decision order to classify_chunk.
    * Null-safe: null classifies as skip (nothing to clean). */
  def classifyChunk(markdown: String): String = {
    if (markdown == null) return "skip"
    // lazy: the toLowerCase copy + 13 contains sweeps only run for the
    // branches that read them (long chunks skip them entirely when they
    // classify heavy first) — decision ORDER is unchanged from
    // classify_chunk, only evaluation is deferred (round 6, guide §1.2)
    lazy val hasNoise = {
      val lower = markdown.toLowerCase(java.util.Locale.ROOT)
      NoiseIndicators.exists(lower.contains)
    }
    val len = cpLen(markdown) // Python len(): code points
    if (codeDensity(markdown) > 0.6) "skip"
    else if (len < 2000 && !hasNoise) "skip"
    else if (hasBrokenTables(markdown) || hasLatex(markdown)) "heavy"
    else if (hasNoise) "cleanup"
    else if (len >= 2000) "cleanup"
    else "skip"
  }

  val classifyUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(classifyChunk _)

  /** Column surface: classify before the expensive stage, so heavy work is
    * gated to the rows that need it (reference gates LLM cleanup). */
  def classify(textCol: Column): Column = classifyUdf(textCol)
}
