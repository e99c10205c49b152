package graft.functions

import graft.util.PyUrl

/** SURT — Sort-friendly URI Reordering Transform — the canonical key
  * form every web archive's index speaks (Internet Archive's
  * webarchive-commons `SURT`/`BasicURLCanonicalizer`, the `surt` Python
  * package, OpenWayback CDX servers). `org,example)/path?a=1` sorts all
  * of a registrable domain's URLs — and all of its subdomains' —
  * contiguously, which is what makes petabyte-scale archive lookup a
  * range scan instead of a scatter. This implements the CDX *key* form
  * (scheme dropped, host reversed comma-joined, `)` separator) with the
  * aggressive canonicalization archive indexes apply before keying:
  *
  *   - lowercase the whole URL; strip the fragment;
  *   - drop a leading `www.` / `www2.` / `wwwN.` host label (subdomain
  *     noise: `www.example.org` and `example.org` must collide);
  *   - drop default ports (http:80, https:443), keep explicit others;
  *   - sort query parameters bytewise (`?b=2&a=1` → `?a=1&b=2`) so
  *     param order never splits one resource across keys; drop a bare
  *     trailing `?`;
  *   - IPv4 hosts are NOT reversed (label reversal is a domain-name
  *     notion; `1.2.3.4` stays `1.2.3.4`);
  *   - empty path becomes `/`.
  *
  * Non-goals, documented: session-id param stripping (jsessionid etc.)
  * and percent-encoding normalization vary per archive profile and are
  * lossy — a pipeline that needs them composes them upstream of this
  * key. Parsing rides [[graft.util.PyUrl]], the same CPython-parity
  * splitter the rest of the engine canonicalizes with, so SURT and F1
  * canonicalization can never disagree about what the host IS. Never
  * throws; unparseable input keys to its lowercased self (a total
  * function — at 100 TB a key function that can reject rows corrupts
  * the index's completeness).
  */
object Surt {

  private val WwwLabel = "^www\\d*$".r
  private val Ipv4 = "^\\d{1,3}(\\.\\d{1,3}){3}$".r

  /** The CDX search key for `url`: `tld,domain[,sub...])/path?sortedquery`. */
  def key(url: String): String = {
    try {
      if (url == null) return ""
      val t = url.trim.toLowerCase
      // schemeless input is an authority, not a path (`example.org/x`):
      // the surt package and webarchive-commons both assume http
      val p = PyUrl.urlsplit(if (t.contains("://")) t else "http://" + t)
      if (p.netloc.isEmpty) return t
      // split credentials off (rare but legal), then port
      val hostPort = p.netloc.substring(p.netloc.lastIndexOf('@') + 1)
      val (host0, port) = hostPort.lastIndexOf(':') match {
        case -1 => (hostPort, "")
        case i if hostPort.substring(i + 1).forall(_.isDigit) =>
          (hostPort.substring(0, i), hostPort.substring(i + 1))
        case _ => (hostPort, "")
      }
      val keepPort = port.nonEmpty &&
        !((p.scheme == "http" && port == "80") ||
          (p.scheme == "https" && port == "443"))
      val labels0 = host0.split('.').toVector.filter(_.nonEmpty)
      val labels =
        if (labels0.length > 2 && WwwLabel.matches(labels0.head)) labels0.tail
        else labels0
      val hostKey =
        if (Ipv4.matches(host0)) host0
        else labels.reverse.mkString(",")
      val path = if (p.path.isEmpty) "/" else p.path
      val query =
        if (p.query.isEmpty) ""
        else "?" + p.query.split('&').toVector.sorted.mkString("&")
      val portPart = if (keepPort) ":" + port else ""
      hostKey + portPart + ")" + path + query
    } catch {
      case scala.util.control.NonFatal(_) =>
        if (url == null) "" else url.trim.toLowerCase
    }
  }

  /** A WARC-Date (`2026-08-19T00:00:05Z`, ISO-8601) as the CDX 14-digit
    * timestamp (`20260819000005`). Lenient: keeps the digits, pads or
    * truncates to 14 — archive tooling accepts reduced precision. */
  def ts14(warcDate: String): String = {
    if (warcDate == null) return ""
    val digits = warcDate.takeWhile(_ != '.').filter(_.isDigit)
    if (digits.length >= 14) digits.substring(0, 14)
    else digits.padTo(14, '0')
  }
}
