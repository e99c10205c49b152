package graft.util

import java.util.Locale

/** Pure-JVM URL parsing/recomposition with the exact semantics of CPython's
  * `urllib.parse` (public stdlib behavior), which the reference engine uses
  * to define URL identity (reference: `src/crawler/discovery.py:25-76`
  * `normalize_url`, `discovery.py:115-121` link absolutization).
  *
  * The seen-set / dedup identity of the whole engine is
  * [[PyUrl.canonicalize]]; getting these rules bit-exact is hard part #1
  * (SURVEY.md §7). Everything here is allocation-light and thread-safe
  * (pure functions), safe to call from whole-stage-codegen'd expressions.
  */
object PyUrl {

  /** Parsed URL components, mirroring python's 6-tuple ParseResult. */
  final case class Parsed(
      scheme: String,
      netloc: String,
      path: String,
      params: String,
      query: String,
      fragment: String)

  // CPython 3.11 strips LEADING C0-control-or-space (trailing is kept) and
  // removes tab/CR/LF anywhere before parsing (_WHATWG_C0_CONTROL_OR_SPACE /
  // _UNSAFE_URL_BYTES_TO_REMOVE; verified empirically against 3.11.7).
  private def sanitize(urlIn: String): String = {
    var s = urlIn
    var i = 0
    while (i < s.length && s.charAt(i) <= ' ') i += 1
    s = s.substring(i)
    if (s.indexOf('\t') >= 0 || s.indexOf('\r') >= 0 || s.indexOf('\n') >= 0) {
      val sb = new java.lang.StringBuilder(s.length)
      var k = 0
      while (k < s.length) {
        val c = s.charAt(k)
        if (c != '\t' && c != '\r' && c != '\n') sb.append(c)
        k += 1
      }
      s = sb.toString
    }
    s
  }

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  /** CPython `urlsplit` (allow_fragments=True). */
  def urlsplit(urlIn: String, defaultScheme: String = ""): Parsed = {
    var url = sanitize(urlIn)
    var scheme = defaultScheme
    val colon = url.indexOf(':')
    if (colon > 0) {
      val cand = url.substring(0, colon)
      val first = cand.charAt(0)
      val firstOk = (first >= 'a' && first <= 'z') || (first >= 'A' && first <= 'Z')
      if (firstOk && cand.forall(isSchemeChar)) {
        scheme = cand.toLowerCase(Locale.ROOT)
        url = url.substring(colon + 1)
      }
    }
    var netloc = ""
    if (url.startsWith("//")) {
      var end = 2
      while (end < url.length && {
          val c = url.charAt(end); c != '/' && c != '?' && c != '#'
        }) end += 1
      netloc = url.substring(2, end)
      url = url.substring(end)
    }
    var fragment = ""
    val h = url.indexOf('#')
    if (h >= 0) { fragment = url.substring(h + 1); url = url.substring(0, h) }
    var query = ""
    val q = url.indexOf('?')
    if (q >= 0) { query = url.substring(q + 1); url = url.substring(0, q) }
    Parsed(scheme, netloc, url, "", query, fragment)
  }

  /** CPython `urlparse`: urlsplit + params split off the LAST path segment
    * — gated on `uses_params` like CPython (for ws/file/svn/… the ';' stays
    * in the path, which matters downstream: urljoin's dot-segment
    * resolution must see `..;q` as one literal segment there). */
  def urlparse(url: String, defaultScheme: String = ""): Parsed = {
    val sp = urlsplit(url, defaultScheme)
    val path = sp.path
    if (usesParams.contains(sp.scheme) && path.indexOf(';') >= 0) {
      val slash = path.lastIndexOf('/')
      if (slash >= 0) {
        val semi = path.indexOf(';', slash)
        if (semi >= 0)
          sp.copy(path = path.substring(0, semi), params = path.substring(semi + 1))
        else sp
      } else {
        val semi = path.indexOf(';')
        sp.copy(path = path.substring(0, semi), params = path.substring(semi + 1))
      }
    } else sp
  }

  /** CPython (3.11) `urlunsplit`: '//' is emitted whenever netloc is
    * non-empty OR the scheme is a uses_netloc scheme and the path doesn't
    * already begin with '//'. */
  def urlunsplit(scheme: String, netloc: String, pathIn: String,
      query: String, fragment: String): String = {
    var url = pathIn
    if (netloc.nonEmpty ||
        (scheme.nonEmpty && usesNetloc.contains(scheme) && !url.startsWith("//"))) {
      if (url.nonEmpty && url.charAt(0) != '/') url = "/" + url
      url = "//" + netloc + url
    }
    val sb = new java.lang.StringBuilder
    if (scheme.nonEmpty) { sb.append(scheme).append(':') }
    sb.append(url)
    if (query.nonEmpty) sb.append('?').append(query)
    if (fragment.nonEmpty) sb.append('#').append(fragment)
    sb.toString
  }

  /** CPython `urlunparse`. */
  def urlunparse(p: Parsed): String = {
    val path = if (p.params.nonEmpty) p.path + ";" + p.params else p.path
    urlunsplit(p.scheme, p.netloc, path, p.query, p.fragment)
  }

  // CPython uses_relative / uses_netloc (urllib/parse.py module constants).
  private val usesRelative = Set("", "ftp", "http", "gopher", "nntp", "imap",
    "wais", "file", "https", "shttp", "mms", "prospero", "rtsp", "rtspu",
    "sftp", "svn", "svn+ssh", "ws", "wss")
  private val usesNetloc = Set("", "ftp", "http", "gopher", "nntp", "telnet",
    "imap", "wais", "file", "mms", "https", "shttp", "snews", "prospero",
    "rtsp", "rtspu", "rsync", "svn", "svn+ssh", "sftp", "nfs", "git",
    "git+ssh", "ws", "wss", "itms-services")
  private val usesParams = Set("", "ftp", "hdl", "prospero", "http", "imap",
    "https", "shttp", "rtsp", "rtspu", "sip", "sips", "mms", "sftp", "tel")

  /** CPython `urljoin` — RFC 3986 §5 relative resolution with CPython's
    * exact quirks (empty-interior-segment filtering, '..' over-pop, trailing
    * '.'/'..' → trailing slash). Reference call site: `discovery.py:115`.
    */
  def urljoin(base: String, url: String): String = {
    if (base.isEmpty) return url
    if (url.isEmpty) return base
    val b = urlparse(base)
    val u = urlparse(url, b.scheme)
    if (u.scheme != b.scheme || !usesRelative.contains(u.scheme)) return url
    var netloc = u.netloc
    if (usesNetloc.contains(u.scheme)) {
      if (u.netloc.nonEmpty)
        return urlunparse(u)
      netloc = b.netloc
    }
    if (u.path.isEmpty && u.params.isEmpty) {
      val query = if (u.query.isEmpty) b.query else u.query
      return urlunparse(Parsed(u.scheme, netloc, b.path, b.params, query, u.fragment))
    }
    val baseParts0 = b.path.split("/", -1).toBuffer
    if (baseParts0.nonEmpty && baseParts0.last != "") baseParts0.remove(baseParts0.size - 1)
    val segments: scala.collection.mutable.Buffer[String] =
      if (u.path.startsWith("/")) u.path.split("/", -1).toBuffer
      else {
        val segs = baseParts0 ++ u.path.split("/", -1).toBuffer
        // segments[1:-1] = filter(None, segments[1:-1])
        if (segs.size > 2) {
          val head = segs.head
          val last = segs.last
          val mid = segs.slice(1, segs.size - 1).filter(_.nonEmpty)
          (scala.collection.mutable.Buffer(head) ++ mid) :+ last
        } else segs
      }
    val resolved = scala.collection.mutable.Buffer.empty[String]
    segments.foreach {
      case ".." => if (resolved.nonEmpty) resolved.remove(resolved.size - 1)
      case "."  => ()
      case seg  => resolved += seg
    }
    if (segments.nonEmpty && (segments.last == "." || segments.last == ".."))
      resolved += ""
    val joined = resolved.mkString("/")
    val path = if (joined.isEmpty) "/" else joined
    urlunparse(Parsed(u.scheme, netloc, path, u.params, u.query, u.fragment))
  }

  /** The engine's URL identity function — exact transcription of the
    * reference's `normalize_url` (`discovery.py:25-76`):
    * truncate at 2000 chars; non-HTTP(S) pass through unchanged; lowercase
    * scheme+netloc; strip trailing slash except root; drop fragment;
    * preserve path case, params and query.
    */
  def canonicalize(urlIn: String): String = {
    val MaxLen = 2000
    // CPython slices by CODE POINTS (url[:2000]); Java substring counts
    // UTF-16 units and can split a surrogate pair, leaving a lone
    // surrogate that UTF8String later mangles — count code points and cut
    // on a code-point boundary like the reference
    val url =
      if (urlIn.length <= MaxLen) urlIn // fast path: ≤2000 units ⇒ ≤2000 cps
      else if (urlIn.codePointCount(0, urlIn.length) <= MaxLen) urlIn
      else urlIn.substring(0, urlIn.offsetByCodePoints(0, MaxLen))
    val p = urlparse(url)
    if (p.scheme != "http" && p.scheme != "https" && p.scheme != "") return url
    val path =
      if (p.path == "/") "/"
      else {
        var j = p.path.length
        while (j > 0 && p.path.charAt(j - 1) == '/') j -= 1
        p.path.substring(0, j)
      }
    urlunparse(Parsed(p.scheme.toLowerCase(Locale.ROOT),
      p.netloc.toLowerCase(Locale.ROOT), path, p.params, p.query, ""))
  }

  /** Host (netloc) of a URL under python-parse semantics. */
  def host(url: String): String = urlparse(url).netloc

  /** Path component under python-parse semantics (params NOT split off,
    * matching `urlparse(url).path` call sites that use urlsplit-like reads —
    * the reference always reads `.path` after `urlparse`, so params are
    * split; we mirror `urlparse`). */
  def path(url: String): String = urlparse(url).path

  /** The nav-parse per-href transform (`discovery.py:305-325`): skip hrefs
    * STARTING with '#' or 'javascript:' (unlike the BFS extractor's
    * contains-check), absolutize, same-domain http(s) only, rebuild as
    * scheme://netloc+path(+?query), then normalize. Empty if dropped. */
  def navClean(pageUrl: String, href: String, baseDomain: String): String = {
    if (href.isEmpty || href.startsWith("#") || href.startsWith("javascript:")) return ""
    val abs = urljoin(pageUrl, href)
    val p = urlparse(abs)
    if (p.netloc != baseDomain || (p.scheme != "http" && p.scheme != "https")) return ""
    val sb = new java.lang.StringBuilder
    sb.append(p.scheme).append("://").append(p.netloc).append(p.path)
    if (p.query.nonEmpty) sb.append('?').append(p.query)
    canonicalize(sb.toString)
  }

  /** The reference link-extractor's "clean URL": scheme://netloc+path
    * (+ ?query if present); params+fragment dropped
    * (`discovery.py:115-121`). Empty if not same-domain http(s). */
  def extractClean(pageUrl: String, href: String, baseDomain: String): String = {
    val lower = href.toLowerCase(Locale.ROOT)
    // reference skips any href CONTAINING these, not just prefixed
    if (lower.contains("#") || lower.contains("javascript:") ||
        lower.contains("mailto:") || lower.contains("tel:")) return ""
    val abs = urljoin(pageUrl, href)
    val p = urlparse(abs)
    if (p.netloc != baseDomain || (p.scheme != "http" && p.scheme != "https")) return ""
    val sb = new java.lang.StringBuilder
    sb.append(p.scheme).append("://").append(p.netloc).append(p.path)
    if (p.query.nonEmpty) sb.append('?').append(p.query)
    sb.toString
  }
}
