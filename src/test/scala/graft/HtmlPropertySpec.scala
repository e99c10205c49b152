package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HtmlToMarkdown

/** Round-3 ask #8: property tests for the lenient-recovery HTML paths
  * (`balancedInner` / `extractMain` / `convert`) against malformed nesting
  * — unclosed tags, case-mixed close tags, comments containing `</main>`,
  * stray brackets. Properties: never crash, extraction scope is a
  * contiguous region of the (comment-stripped) input, and well-formed
  * documents extract exactly their main region regardless of decoys. */
class HtmlPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, tests: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(tests)
        .withInitialSeed(Seed(20260817L)), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ---- malformed-HTML soup generator ----

  private val tagNames = Gen.oneOf("main", "article", "div", "span", "p",
    "section", "body", "h1", "li", "ul", "script", "style", "nav")

  /** random-case spelling of a tag name (case-mixed close tags). */
  private def mixCase(s: String): Gen[String] =
    Gen.listOfN(s.length, Gen.oneOf(true, false)).map { ups =>
      s.zip(ups).map { case (c, u) => if (u) c.toUpper else c }.mkString
    }

  private val attr: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const(" class=\"content\""),
    Gen.const(" role='main'"),
    Gen.const(" id=\"content\""),
    Gen.const(" data-x=\"a > b\""), // '>' inside a quoted attr value
    Gen.const(" class='sidebar'"))

  private val openTag: Gen[String] = for {
    t <- tagNames; tc <- mixCase(t); a <- attr
  } yield s"<$tc$a>"

  private val closeTag: Gen[String] = for {
    t <- tagNames; tc <- mixCase(t)
    ws <- Gen.oneOf("", " ", "\t")
  } yield s"</$tc$ws>"

  private val comment: Gen[String] = Gen.oneOf(
    "<!-- plain -->", "<!-- </main> decoy -->", "<!-- <main> opener -->",
    "<!-- a > b -->", "<!--->", "<!-->", "<!-- bang-closed --!>",
    "<!-- unterminated", "<!---->")

  private val text: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(40)),
    Gen.const("&amp;lt; escaped &nbsp; entities &#39;"),
    Gen.const("stray < bracket and > arrow"),
    Gen.const("x" * 250)) // long enough to clear the 200-char region gate

  private val soupToken: Gen[String] =
    Gen.frequency(4 -> openTag, 4 -> closeTag, 2 -> comment, 5 -> text,
      1 -> Gen.const("<"), 1 -> Gen.const(">"), 1 -> Gen.const("</"))

  private val soup: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, soupToken)).map(_.mkString)

  // ---- properties ----

  test("property: convert and extractMain never crash on malformed soup") {
    check("no-crash", Prop.forAll(soup) { html =>
      val md = HtmlToMarkdown.convert(html)
      val main = HtmlToMarkdown.extractMain(html)
      (md ne null) && (main ne null)
    })
  }

  test("property: extraction scope is one contiguous region of the comment-stripped input") {
    check("substring-scope", Prop.forAll(soup) { html =>
      val clean = HtmlToMarkdown.stripComments(html)
      val main = HtmlToMarkdown.extractMain(html)
      clean.contains(main) // whole-doc fallback included (s.contains(s))
    })
  }

  test("property: balancedInner returns the suffix-bounded region from its start offset") {
    val withOffset = for {
      html <- soup
      from <- Gen.chooseNum(0, html.length)
      tag <- tagNames
    } yield (html, from, tag)
    check("balanced-region", Prop.forAll(withOffset) { case (html, from, tag) =>
      val inner = HtmlToMarkdown.balancedInner(html, from, tag)
      // always html[from, from+len) — a contiguous region starting at from,
      // never reordered or synthesized content
      inner == html.substring(from, from + inner.length)
    })
  }

  test("property: well-formed docs extract exactly the main region despite decoys") {
    // known-answer witness: nested same-tag children, case-mixed close tags
    // and comment decoys around/inside — extractMain must return precisely
    // the depth-balanced inner HTML of <main>
    val witness = for {
      innerText <- Gen.alphaNumStr.map(t => "y" * 210 + t.take(30))
      nested <- Gen.chooseNum(0, 3)
      mainClose <- mixCase("main").map(t => s"</$t>")
      decoy <- Gen.oneOf("", "<!-- </main> -->", "<!-- <main> -->")
    } yield {
      val inner = ("<div>" * nested) + decoy + innerText + ("</div>" * nested)
      val html = s"<html><body><p>prefix</p>$decoy<main class='m'>$inner" +
        s"$mainClose<p>suffix</p></body></html>"
      (html, HtmlToMarkdown.stripComments(inner))
    }
    check("witness", Prop.forAll(witness) { case (html, want) =>
      HtmlToMarkdown.extractMain(html) == want
    }, tests = 200)
  }

  test("property: unclosed main recovers leniently to end-of-document") {
    val unclosed = for {
      innerText <- Gen.const("z" * 220)
      tail <- Gen.oneOf("", "<p>more", "</div></div>")
    } yield s"<body><main>$innerText$tail" // never closed
    check("unclosed", Prop.forAll(unclosed) { html =>
      val got = HtmlToMarkdown.extractMain(html)
      got == html.substring(html.indexOf("<main>") + "<main>".length)
    }, tests = 50)
  }

  test("comments leak neither markup nor text into the markdown") {
    val md = HtmlToMarkdown.convert(
      "<body><p>keep</p><!-- <h1>gone</h1> a > b --><p>also</p></body>")
    assert(md.contains("keep") && md.contains("also"))
    assert(!md.contains("gone") && !md.contains("b -->"))
    // unterminated comment comments out the rest (HTML5 recovery)
    val md2 = HtmlToMarkdown.convert("<p>seen</p><!-- <p>lost</p>")
    assert(md2.contains("seen") && !md2.contains("lost"))
    // HTML5 abruptly-closed EMPTY comments (`<!-->`, `<!--->`) are
    // complete — treating them as unterminated would silently drop the
    // entire rest of a well-formed page
    val md3 = HtmlToMarkdown.convert(
      "<p>first</p><!--><p>second</p><!---><p>third</p>")
    assert(md3.contains("first") && md3.contains("second") && md3.contains("third"))
    // `--!>` also ends a comment (HTML5); its body stays hidden
    val md4 = HtmlToMarkdown.convert(
      "<p>keep</p><!-- <b>hidden</b> --!><p>tail</p>")
    assert(md4.contains("keep") && md4.contains("tail") && !md4.contains("hidden"))
  }
}
