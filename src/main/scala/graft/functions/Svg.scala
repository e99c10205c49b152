package graft.functions

import java.io.ByteArrayInputStream

/** SVG image METADATA — pixel dimensions, element census, and the two
  * scrub signals a crawl pipeline checks before republishing vector
  * images: `has_script` (SVG is an XML format that can CARRY executable
  * script — `<script>` elements and `on*` event attributes are the
  * classic stored-XSS vector in user-uploaded avatars/logos) and
  * `has_external_ref` (an `href` to another origin makes rendering
  * phone home — the tracking-pixel shape). Dimensions follow the SVG 2
  * sizing rules: `width`/`height` presentation attributes with CSS
  * absolute units converted at the standard 96 dpi ratios
  * (1in = 96px, 1pt = 4/3px, 1pc = 16px, 1mm = 96/25.4), falling back
  * to the `viewBox` when the attributes are absent or percentages.
  *
  * Entity posture matches [[graft.sources.Sitemaps.parse]] (defusedxml
  * defaults): any `<!ENTITY` declaration rejects the payload outright;
  * an entity-free DOCTYPE is stripped before the hardened JDK parse —
  * a billion-laughs or XXE payload classifies, never expands.
  *
  * Malformed/truncated payloads classify (None), never throw. */
object Svg {

  final case class Meta(
      width: Int, height: Int, // resolved px (rounded); -1 when unsizable
      nElements: Int, // document-wide element census
      hasScript: Boolean, // <script> element or any on* event attribute
      hasExternalRef: Boolean) // href/xlink:href to an http(s) origin

  private val DoctypeRe =
    java.util.regex.Pattern.compile("<!DOCTYPE[^>\\[]*(\\[[^\\]]*\\])?>",
      java.util.regex.Pattern.DOTALL)

  /** Cheap content sniff: after optional BOM/whitespace/XML-decl/
    * comments/DOCTYPE, the first element's local name is `svg`. Bounded
    * to the payload head — triage runs this on every fetched body. */
  def isSvg(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 4) return false
    val n = math.min(bytes.length, 2048)
    var i = if ((bytes(0) & 0xff) == 0xef && n >= 3) 3 else 0 // UTF-8 BOM
    val s = new String(bytes, i, n - i, java.nio.charset.StandardCharsets.UTF_8)
    var p = 0
    def skipWs(): Unit = while (p < s.length && s.charAt(p).isWhitespace) p += 1
    skipWs()
    var guard = 0
    while (p < s.length && s.charAt(p) == '<' && guard < 16) {
      guard += 1
      if (s.startsWith("<?", p)) {
        val e = s.indexOf("?>", p); if (e < 0) return false; p = e + 2
      } else if (s.startsWith("<!--", p)) {
        val e = s.indexOf("-->", p); if (e < 0) return false; p = e + 3
      } else if (s.startsWith("<!", p)) {
        val e = s.indexOf('>', p); if (e < 0) return false; p = e + 1
      } else {
        // first real element: local name after an optional prefix
        var q = p + 1
        while (q < s.length && s.charAt(q) != ' ' && s.charAt(q) != '\t' &&
          s.charAt(q) != '\n' && s.charAt(q) != '\r' && s.charAt(q) != '>' &&
          s.charAt(q) != '/') q += 1
        val name = s.substring(p + 1, q)
        val local = name.substring(name.indexOf(':') + 1)
        return local == "svg"
      }
      skipWs()
    }
    false
  }

  /** Parse a CSS length to px at 96 dpi; None for percentages or junk. */
  private def lengthPx(raw: String): Option[Double] = {
    val v = raw.trim
    if (v.isEmpty) return None
    val unitStart = v.indexWhere(c => !(c.isDigit || c == '.' || c == '-' || c == '+'))
    val (num, unit) =
      if (unitStart < 0) (v, "") else (v.substring(0, unitStart), v.substring(unitStart).trim)
    val d = try num.toDouble catch { case _: NumberFormatException => return None }
    unit match {
      case "" | "px" => Some(d)
      case "pt" => Some(d * 4.0 / 3.0)
      case "pc" => Some(d * 16.0)
      case "in" => Some(d * 96.0)
      case "mm" => Some(d * 96.0 / 25.4)
      case "cm" => Some(d * 96.0 / 2.54)
      case _ => None // %, em, ex, vw…: viewport-relative → viewBox fallback
    }
  }

  def imageMeta(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isSvg(bytes)) return None
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      if (text.contains("<!ENTITY")) return None // EntitiesForbidden
      val raw =
        if (text.contains("<!DOCTYPE"))
          DoctypeRe.matcher(text).replaceFirst("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        else bytes
      // shared thread-local hardened builder (silent handler included) —
      // per-row JAXP factory construction dominated this walk (round 6)
      val doc = graft.util.HardenedXml.builder()
        .parse(new ByteArrayInputStream(raw))
      val root = doc.getDocumentElement
      if (root == null || root.getLocalName != "svg") return None

      // dims: width/height attrs, else viewBox width/height
      val attrW = lengthPx(root.getAttribute("width"))
      val attrH = lengthPx(root.getAttribute("height"))
      val viewBox = root.getAttribute("viewBox").trim
        .split("[\\s,]+").filter(_.nonEmpty)
      val vb =
        if (viewBox.length == 4)
          try Some((viewBox(2).toDouble, viewBox(3).toDouble))
          catch { case _: NumberFormatException => None }
        else None
      val w = attrW.orElse(vb.map(_._1)).map(d => math.round(d).toInt).getOrElse(-1)
      val h = attrH.orElse(vb.map(_._2)).map(d => math.round(d).toInt).getOrElse(-1)

      var nElements = 0
      var hasScript = false
      var hasExternal = false
      val all = doc.getElementsByTagName("*")
      var i = 0
      while (i < all.getLength) {
        val e = all.item(i).asInstanceOf[org.w3c.dom.Element]
        nElements += 1
        if (e.getLocalName == "script") hasScript = true
        val attrs = e.getAttributes
        var j = 0
        while (j < attrs.getLength) {
          val a = attrs.item(j).asInstanceOf[org.w3c.dom.Attr]
          val local = a.getLocalName
          if (local != null && local.length > 2 && local.startsWith("on"))
            hasScript = true
          val v = a.getValue.trim
          if ((local == "href" || a.getName == "xlink:href") &&
              (v.startsWith("http://") || v.startsWith("https://") || v.startsWith("//")))
            hasExternal = true
          if (v.replaceAll("\\s", "").toLowerCase
              .startsWith("javascript:")) hasScript = true
          j += 1
        }
        i += 1
      }
      Some(Meta(w, h, nElements, hasScript, hasExternal))
    } catch { case scala.util.control.NonFatal(_) => None }

}
