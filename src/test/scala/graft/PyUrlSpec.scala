package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.PyUrl

/** Pins [[PyUrl]] to the reference's behavior. Case table transcribed from
  * reference tests `tests/crawler/test_discovery.py:24-79,324-336`. */
class PyUrlSpec extends AnyFunSuite {

  test("removes fragment") {
    assert(PyUrl.canonicalize("https://example.com/page#section") == "https://example.com/page")
  }
  test("preserves query params") {
    assert(PyUrl.canonicalize("https://example.com/page?foo=bar&baz=qux") ==
      "https://example.com/page?foo=bar&baz=qux")
  }
  test("removes trailing slash") {
    assert(PyUrl.canonicalize("https://example.com/page/") == "https://example.com/page")
  }
  test("preserves root slash") {
    assert(PyUrl.canonicalize("https://example.com/") == "https://example.com/")
  }
  test("lowercases scheme and domain") {
    assert(PyUrl.canonicalize("HTTPS://EXAMPLE.COM/Path") == "https://example.com/Path")
  }
  test("preserves path case") {
    assert(PyUrl.canonicalize("https://example.com/CamelCase") == "https://example.com/CamelCase")
  }
  test("handles empty fragment") {
    assert(PyUrl.canonicalize("https://example.com/page#") == "https://example.com/page")
  }
  test("handles complex url with port") {
    assert(PyUrl.canonicalize("HTTPS://EXAMPLE.COM:443/Path/To/Page?query=1&foo=bar#fragment") ==
      "https://example.com:443/Path/To/Page?query=1&foo=bar")
  }
  test("dedup scenario: five spellings → one canonical") {
    val urls = Seq(
      "https://example.com/page",
      "https://example.com/page/",
      "https://example.com/page#section",
      "HTTPS://EXAMPLE.COM/page",
      "https://example.com/page#another")
    assert(urls.map(PyUrl.canonicalize).toSet.size == 1)
  }
  test("unicode path survives") {
    assert(PyUrl.canonicalize("https://example.com/página").startsWith("https://example.com/"))
  }
  test("2000-char truncation slices by code points, never mid-surrogate (CPython url[:2000])") {
    // base puts a non-BMP char (2 UTF-16 units) straddling index 2000
    val base = "https://example.com/" + "a" * 1979 // length 1999
    val url = base + "😀" + "tail" * 50   // emoji starts at 1999
    val out = PyUrl.canonicalize(url)
    // CPython url[:2000] keeps 2000 CODE POINTS: the emoji is kept whole
    assert(out.codePointCount(0, out.length) == 2000)
    assert(out.endsWith("😀")) // not a lone high surrogate
    assert(!out.exists(c => Character.isHighSurrogate(c) &&
      out.indexOf(c) == out.length - 1))
    // pure-BMP long URLs cut at exactly 2000 chars as before
    val bmp = PyUrl.canonicalize("https://example.com/" + "b" * 3000)
    assert(bmp.length == 2000)
  }
  test("percent-encoding preserved") {
    assert(PyUrl.canonicalize("https://example.com/path%20with%20spaces").contains("%20"))
  }
  test("non-http scheme passes through unchanged") {
    assert(PyUrl.canonicalize("mailto:a@b.com") == "mailto:a@b.com")
    assert(PyUrl.canonicalize("ftp://example.com/x/") == "ftp://example.com/x/")
  }
  test("no-scheme URL handled like python (no netloc)") {
    // python: urlparse("example.com/path/").path == "example.com/path/"
    assert(PyUrl.canonicalize("example.com/path/") == "example.com/path")
  }
  test("bare domain (empty path) unchanged") {
    assert(PyUrl.canonicalize("https://example.com") == "https://example.com")
  }
  test("2000-char truncation") {
    val u = "https://example.com/" + ("a" * 3000)
    assert(PyUrl.canonicalize(u).length <= 2000)
  }
  test("params component preserved") {
    assert(PyUrl.canonicalize("https://example.com/p;v=1?q=2#f") == "https://example.com/p;v=1?q=2")
  }

  test("params split gated on uses_params like CPython (ws/file keep ';' in the path)") {
    // verified against CPython 3.11 urllib.parse this round:
    //   urlparse('ws://h/p;x').params == ''  (ws not in uses_params)
    //   urljoin('ws://h/a/b', '..;q')   == 'ws://h/a/..;q'  ('..;q' literal)
    //   urljoin('http://h/a/b', '..;q') == 'http://h/;q'    (params split off)
    //   urljoin('file:///a/b/c', '..;z') == 'file:///a/b/..;z'
    assert(PyUrl.urlparse("ws://h/p;x").params == "")
    assert(PyUrl.urlparse("ws://h/p;x").path == "/p;x")
    assert(PyUrl.urlparse("http://h/p;x").params == "x")
    assert(PyUrl.urljoin("ws://h/a/b", "..;q") == "ws://h/a/..;q")
    assert(PyUrl.urljoin("http://h/a/b", "..;q") == "http://h/;q")
    assert(PyUrl.urljoin("file:///a/b/c", "..;z") == "file:///a/b/..;z")
  }

  // urljoin cases — values verified against CPython urllib.parse.urljoin
  test("urljoin absolute href wins") {
    assert(PyUrl.urljoin("https://a.com/x/y", "https://b.com/z") == "https://b.com/z")
  }
  test("urljoin relative") {
    assert(PyUrl.urljoin("https://a.com/x/y", "z") == "https://a.com/x/z")
    assert(PyUrl.urljoin("https://a.com/x/y/", "z") == "https://a.com/x/y/z")
    assert(PyUrl.urljoin("https://a.com/x/y", "/z") == "https://a.com/z")
  }
  test("urljoin dot segments") {
    assert(PyUrl.urljoin("https://a.com/x/y/z", "../w") == "https://a.com/x/w")
    assert(PyUrl.urljoin("https://a.com/x/y/z", "./w") == "https://a.com/x/y/w")
    assert(PyUrl.urljoin("https://a.com/x/", "..") == "https://a.com/")
    assert(PyUrl.urljoin("https://a.com/x/y", ".") == "https://a.com/x/")
  }
  test("urljoin protocol-relative") {
    assert(PyUrl.urljoin("https://a.com/x", "//b.com/y") == "https://b.com/y")
  }
  test("urljoin empty url returns base") {
    assert(PyUrl.urljoin("https://a.com/x", "") == "https://a.com/x")
  }
  test("urljoin query-only href") {
    assert(PyUrl.urljoin("https://a.com/x/y?old=1", "?new=2") == "https://a.com/x/y?new=2")
  }

  test("extractClean: reference link-extractor semantics") {
    val base = "site-0.test"
    // href containing '#' anywhere is skipped entirely (discovery.py:110-114)
    assert(PyUrl.extractClean("https://site-0.test/a", "/b#frag", base) == "")
    assert(PyUrl.extractClean("https://site-0.test/a", "mailto:x@y.z", base) == "")
    assert(PyUrl.extractClean("https://site-0.test/a", "javascript:void(0)", base) == "")
    assert(PyUrl.extractClean("https://site-0.test/a", "tel:+123", base) == "")
    // other-domain dropped
    assert(PyUrl.extractClean("https://site-0.test/a", "https://other.test/x", base) == "")
    // relative resolution + query preserved, fragmentless
    assert(PyUrl.extractClean("https://site-0.test/docs/a", "b?x=1", base) ==
      "https://site-0.test/docs/b?x=1")
  }

  test("CPython parity corpus: canonicalize (262 cases)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pyurl_canon_corpus.tsv"), "UTF-8")
    try src.getLines().foreach { line =>
      val Array(in, expected) = line.split("\t", -1).map(_.replace("\\t", "\t"))
      assert(PyUrl.canonicalize(in) == expected, s"input=<$in>")
    } finally src.close()
  }

  test("CPython parity corpus: urljoin (237 cases)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pyurl_join_corpus.tsv"), "UTF-8")
    try src.getLines().foreach { line =>
      val Array(base, href, expected) = line.split("\t", -1)
      assert(PyUrl.urljoin(base, href) == expected, s"base=<$base> href=<$href>")
    } finally src.close()
  }

  test("CPython parity corpus: adversarial canonicalize cases (astral, IPv6, userinfo, params)") {
    // generated with CPython urllib.parse + the reference's normalize_url
    // transcription (discovery.py:25-76): astral chars at the 2000-cp
    // boundary, IPv6/port/userinfo netlocs, params/queries/empty
    // fragments, embedded \t\n (urlparse strips them), backslashes,
    // non-http schemes, scheme-less forms
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pyurl_canon_extra.tsv"), "UTF-8")
    try src.getLines().foreach { line =>
      val Array(in, expected) =
        line.split("\t", -1).map(_.replace("\\t", "\t").replace("\\n", "\n"))
      assert(PyUrl.canonicalize(in) == expected, s"input=<${in.take(120)}>")
    } finally src.close()
  }

  test("CPython parity corpus: adversarial urljoin cases") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pyurl_join_extra.tsv"), "UTF-8")
    try src.getLines().foreach { line =>
      val Array(base, href, expected) = line.split("\t", -1)
      assert(PyUrl.urljoin(base, href) == expected, s"base=<$base> href=<$href>")
    } finally src.close()
  }

  test("property: canonicalize is idempotent (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    val schemes = Seq("http", "https", "HTTP", "HTTPS")
    val slashes = Seq("", "/", "//")
    val frags = Seq("", "#x", "#")
    val queries = Seq("", "?a=1&b=2")
    (1 to 500).foreach { _ =>
      val segs = Seq.fill(3)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val u = s"${schemes(rnd.nextInt(4))}://Site-${rnd.nextInt(20)}.TEST/" +
        segs.mkString("/") + slashes(rnd.nextInt(3)) +
        queries(rnd.nextInt(2)) + frags(rnd.nextInt(3))
      val once = PyUrl.canonicalize(u)
      assert(PyUrl.canonicalize(once) == once, s"not idempotent for $u")
    }
  }

  test("property: urljoin result canonicalizes stably (seeded sweep)") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      def part = rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
      val base = s"https://h.test/$part/$part/"
      val href = Seq.fill(1 + rnd.nextInt(3))(
        Seq(part, "..", ".", part)(rnd.nextInt(4))).mkString("/")
      val joined = PyUrl.urljoin(base, href)
      assert(joined.startsWith("https://h.test"), s"base=$base href=$href -> $joined")
      assert(PyUrl.canonicalize(PyUrl.canonicalize(joined)) == PyUrl.canonicalize(joined))
    }
  }
}
