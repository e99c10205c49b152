package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D5/S11 — structured JSON output: typed content blocks from HTML
  * (reference PR 3.2, `src/scraper/structured.py:25-201`). The seven block
  * types — heading, paragraph, code, table, list, image, blockquote — are
  * extracted in document order from the main-content region
  * (main → article → role=main → body fallback, `structured.py:170-177`).
  *
  * The reference parses with BeautifulSoup and recurses into containers;
  * this is a static single-pass scanner over the tag stream (containers
  * only group, so stripping their tags preserves the block order the
  * recursion would produce). Table content is the reference's
  * rows-as-JSON, emitted with compact separators. The sink shape is a
  * nested `array<struct>` column — the Spark-native form of the
  * reference's per-page JSON file (`save_structured`,
  * `structured.py:186-201`); `df.write.json` reproduces the file sink.
  */
object Structured {

  final case class Block(
      blockType: String,
      content: String,
      level: Option[Int],
      language: Option[String],
      alt: Option[String])

  // &amp; LAST — decoding it first double-decodes escaped entities
  private val EntityMap = Seq(
    "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private def decodeEntities(s: String): String =
    EntityMap.foldLeft(s) { case (acc, (k, v)) => acc.replace(k, v) }

  /** BeautifulSoup `get_text(separator=sep, strip=True)` analog: text
    * nodes joined by sep, whitespace collapsed, ends trimmed. */
  def getText(inner: String, sep: String = " "): String = {
    val txt = decodeEntities(inner.replaceAll("(?s)<[^>]*>", "\u0000"))
    txt.split('\u0000').map(_.trim).filter(_.nonEmpty).mkString(sep)
  }

  def title(rawHtml: String): Option[String] = {
    // comment-masked, like BeautifulSoup: `<!-- <title>x</title> -->`
    // must not win over the real title
    val html = graft.sources.HtmlToMarkdown.stripComments(rawHtml)
    val m = java.util.regex.Pattern
      .compile("(?is)<title[^>]*>(.*?)</title>").matcher(html)
    if (m.find()) Some(getText(m.group(1))).filter(_.nonEmpty) else None
  }

  /** Inner HTML from `from` to the close tag BALANCING the already-matched
    * open tag: nested same-name elements are depth-tracked, so
    * `<div role="main"><div>…</div><p>…</p></div>` yields the whole region
    * (a lazy `(.*?)</tag>` regex stops at the first inner close and
    * silently truncates the region to its first child). Unclosed → to end
    * of document (lenient, like a real DOM parser's recovery). */
  private def balancedInner(html: String, from: Int, tag: String): String = {
    val p = java.util.regex.Pattern.compile(s"(?is)<$tag\\b[^>]*>|</$tag\\s*>")
    val m = p.matcher(html)
    var depth = 1
    var pos = from
    while (m.find(pos)) {
      if (m.group().startsWith("</")) depth -= 1 else depth += 1
      if (depth == 0) return html.substring(from, m.start())
      pos = m.end()
    }
    html.substring(from)
  }

  /** Main-content region: first of main/article/[role=main]/body, else the
    * whole document (`structured.py:170-177`); regions close on the
    * DEPTH-BALANCED end tag via [[balancedInner]]. */
  def mainContent(html: String): String = {
    val opens = Seq(
      "(?is)<(main)\\b[^>]*>",
      "(?is)<(article)\\b[^>]*>",
      "(?is)<([a-z]+)\\b[^>]*\\brole=[\"']main[\"'][^>]*>",
      "(?is)<(body)\\b[^>]*>")
    opens.view.flatMap { p =>
      val m = java.util.regex.Pattern.compile(p).matcher(html)
      if (m.find())
        Some(balancedInner(html, m.end(),
          m.group(1).toLowerCase(java.util.Locale.ROOT)))
      else None
    }.headOption.getOrElse(html)
  }

  private val BlockOpen = java.util.regex.Pattern.compile(
    "(?is)<(h[1-6]|pre|code|table|ul|ol|blockquote|img|p)\\b[^>]*>")

  private def attr(tag: String, name: String): Option[String] = {
    // (?<![\w-]) not \b: a word boundary alone lets `src=` match inside
    // `data-src=` (hyphen is a boundary), extracting the wrong attribute.
    // Quote alternation (not a [\"'] class): the value must close with the
    // SAME quote that opened it — alt="dog's toy" keeps its apostrophe
    // instead of truncating at it
    val m = java.util.regex.Pattern
      .compile(s"""(?is)(?<![\\w-])$name\\s*=\\s*("([^"]*)"|'([^']*)')""").matcher(tag)
    if (m.find()) Option(m.group(2)).orElse(Option(m.group(3))) else None
  }

  /** Parse the main-content region into typed blocks, document order. */
  def parseBlocks(rawHtml: String): Seq[Block] = {
    // comment-masked first (BeautifulSoup never sees commented-out markup
    // — a `<!-- <h1>x</h1> -->` is not a block, and a comment containing
    // `</main>` must not close the region early)
    val html = graft.sources.HtmlToMarkdown.stripComments(rawHtml)
    // containers only group; dropping their tags preserves block order
    val flat = mainContent(html)
      .replaceAll("(?is)<(script|style)\\b[^>]*>.*?</\\1>", " ")
      .replaceAll("(?is)</?(div|section|article|main|aside|nav|header|span)[^>]*>", " ")
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val m = BlockOpen.matcher(flat)
    var pos = 0
    while (m.find(pos)) {
      val tag = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val openEnd = m.end()
      if (tag == "img") {
        val whole = flat.substring(m.start(), openEnd)
        attr(whole, "src").filter(_.nonEmpty).foreach { src =>
          out += Block("image", src, None, None,
            attr(whole, "alt").filter(_.nonEmpty))
        }
        pos = openEnd
      } else {
        // DEPTH-BALANCED close, not the first `</tag`: nested same-name
        // elements (table-in-table, ul-in-ul, nested blockquote) would
        // otherwise truncate at the inner close and leave stray markup —
        // BeautifulSoup's recursive parse (the reference semantics,
        // structured.py) handles nesting; same fix mainContent() already
        // uses via balancedInner
        val inner0 = graft.sources.HtmlToMarkdown.balancedInner(flat, openEnd, tag)
        val closeStart = openEnd + inner0.length
        val hasClose = closeStart < flat.length // ran to EOF = never closed
        val inner = if (hasClose) inner0 else ""
        val next = if (hasClose)
          math.max(closeStart + tag.length + 3, flat.indexOf('>', closeStart) + 1)
        else openEnd
        tag match {
          case h if h.startsWith("h") && h.length == 2 =>
            val t = getText(inner)
            if (t.nonEmpty) out += Block("heading", t, Some(h.drop(1).toInt), None, None)
          case "pre" =>
            val cm = java.util.regex.Pattern
              .compile("(?is)<code\\b([^>]*)>(.*?)</code>").matcher(inner)
            if (cm.find()) {
              val lang = attr(cm.group(1), "class")
                .flatMap(_.split("\\s+").find(_.startsWith("language-")))
                .map(_.stripPrefix("language-"))
              out += Block("code", decodeEntities(
                cm.group(2).replaceAll("(?s)<[^>]*>", "")), None, lang, None)
            } else out += Block("code",
              decodeEntities(inner.replaceAll("(?s)<[^>]*>", "")), None, None, None)
          case "code" => // standalone (pre>code is consumed by the pre branch)
            val t = decodeEntities(inner.replaceAll("(?s)<[^>]*>", ""))
            if (t.trim.nonEmpty) out += Block("code", t, None, None, None)
          case "table" =>
            val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
            val trm = java.util.regex.Pattern
              .compile("(?is)<tr[^>]*>(.*?)</tr>").matcher(inner)
            while (trm.find()) {
              val cells = scala.collection.mutable.ArrayBuffer.empty[String]
              val cm = java.util.regex.Pattern
                .compile("(?is)<(td|th)[^>]*>(.*?)</\\1>").matcher(trm.group(1))
              while (cm.find()) cells += getText(cm.group(2))
              rows += cells.toSeq
            }
            if (rows.nonEmpty) {
              // reference: json.dumps(rows); compact separators here.
              // Control chars must be escaped too or the JSON is invalid.
              def jstr(c: String): String = {
                val sb = new java.lang.StringBuilder("\"")
                c.foreach {
                  case '\\' => sb.append("\\\\")
                  case '"' => sb.append("\\\"")
                  case ch if ch < ' ' => sb.append(f"\\u${ch.toInt}%04x")
                  case ch => sb.append(ch)
                }
                sb.append("\"").toString
              }
              val json = rows.map(_.map(jstr)
                .mkString("[", ",", "]")).mkString("[", ",", "]")
              out += Block("table", json, None, None, None)
            }
          case "ul" | "ol" =>
            val items = scala.collection.mutable.ArrayBuffer.empty[String]
            val lim = java.util.regex.Pattern
              .compile("(?is)<li[^>]*>(.*?)(?:</li>|$)").matcher(inner)
            while (lim.find()) {
              val t = getText(lim.group(1))
              if (t.nonEmpty) items += t
            }
            if (items.nonEmpty) out += Block("list", items.mkString("\n"), None, None, None)
          case "blockquote" =>
            val t = getText(inner, sep = "\n")
            if (t.nonEmpty) out += Block("blockquote", t, None, None, None)
          case "p" =>
            val t = getText(inner)
            if (t.nonEmpty) out += Block("paragraph", t, None, None, None)
          case _ => ()
        }
        pos = next
      }
    }
    out.toSeq
  }

  // null html rows (failed fetches) must not NPE the stage
  private val titleUdf = udf((html: String) =>
    if (html == null) None else title(html))
  private val blocksUdf = udf((html: String) =>
    if (html == null) Seq.empty[Block] else parseBlocks(html))

  /** D5 operator: (url, html) → StructuredPage rows
    * (url, title, blocks: array<struct<blockType,content,level,language,alt>>). */
  def toStructured(pages: DataFrame, urlCol: Column, htmlCol: Column): DataFrame =
    pages.select(urlCol.as("url"), titleUdf(htmlCol).as("title"),
      blocksUdf(htmlCol).as("blocks"))
}
