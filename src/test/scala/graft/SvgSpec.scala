package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MediaMeta, Svg}

/** X1 — SVG metadata: CSS-unit dimension resolution with viewBox
  * fallback, the has_script / has_external_ref scrub signals, the
  * hardened-XML posture (entities reject), and the content sniff that
  * routes SVG through the triage. Malformed payloads classify. */
class SvgSpec extends AnyFunSuite {

  private def svg(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("dims: absolute units convert at 96 dpi; viewBox is the fallback") {
    val cases = Seq(
      ("""<svg xmlns="http://www.w3.org/2000/svg" width="120" height="80"/>""", 120, 80),
      ("""<svg xmlns="http://www.w3.org/2000/svg" width="120px" height="80px"/>""", 120, 80),
      ("""<svg xmlns="http://www.w3.org/2000/svg" width="90pt" height="30pt"/>""", 120, 40),
      ("""<svg xmlns="http://www.w3.org/2000/svg" width="2in" height="1in"/>""", 192, 96),
      ("""<svg xmlns="http://www.w3.org/2000/svg" width="10pc" height="5pc"/>""", 160, 80),
      ("""<svg xmlns="http://www.w3.org/2000/svg" width="25.4mm" height="2.54cm"/>""", 96, 96),
      ("""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 300 150"/>""", 300, 150),
      // percentages are viewport-relative → viewBox decides
      ("""<svg xmlns="http://www.w3.org/2000/svg" width="100%" height="50%" viewBox="0 0 640 480"/>""", 640, 480),
      // comma-separated viewBox is legal
      ("""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0,0,32,16"/>""", 32, 16))
    for ((doc, w, h) <- cases) {
      val m = Svg.imageMeta(svg(doc)).getOrElse(fail(doc))
      assert(m.width == w && m.height == h, doc)
    }
    // nothing sizable → -1, still parses
    val bare = Svg.imageMeta(svg("""<svg xmlns="http://www.w3.org/2000/svg"/>""")).get
    assert(bare.width == -1 && bare.height == -1)
  }

  test("scrub signals: script elements, on* attributes, javascript: hrefs, external refs") {
    val clean = Svg.imageMeta(svg(
      """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 8 8"><rect width="3" height="3"/></svg>""")).get
    assert(!clean.hasScript && !clean.hasExternalRef && clean.nElements == 2)

    val script = Svg.imageMeta(svg(
      """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 8 8"><script>x()</script></svg>""")).get
    assert(script.hasScript)

    val onAttr = Svg.imageMeta(svg(
      """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 8 8"><rect onload="x()" width="1" height="1"/></svg>""")).get
    assert(onAttr.hasScript)

    val jsHref = Svg.imageMeta(svg(
      """<svg xmlns="http://www.w3.org/2000/svg" xmlns:xlink="http://www.w3.org/1999/xlink" viewBox="0 0 8 8">""" +
        """<a xlink:href="java&#115;cript:x()"><rect width="1" height="1"/></a></svg>""")).get
    assert(jsHref.hasScript)

    val ext = Svg.imageMeta(svg(
      """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 8 8"><image href="https://t.test/p.png"/></svg>""")).get
    assert(ext.hasExternalRef && !ext.hasScript)
    // local href is not external
    val local = Svg.imageMeta(svg(
      """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 8 8"><use href="#a"/></svg>""")).get
    assert(!local.hasExternalRef)
  }

  test("hardened XML: entity declarations reject; entity-free DOCTYPE tolerated") {
    val xxe =
      """<?xml version="1.0"?><!DOCTYPE svg [<!ENTITY x SYSTEM "file:///etc/passwd">]>""" +
        """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 8 8">&x;</svg>"""
    assert(Svg.imageMeta(svg(xxe)).isEmpty)
    val doctype =
      """<?xml version="1.0"?><!DOCTYPE svg PUBLIC "-//W3C//DTD SVG 1.1//EN" "x.dtd">""" +
        """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 8 8"/>"""
    val m = Svg.imageMeta(svg(doctype)).getOrElse(fail("doctype must parse"))
    assert(m.width == 8 && m.height == 8)
  }

  test("sniff + triage: XML decl/comments/BOM tolerated; non-svg XML refused") {
    assert(Svg.isSvg(svg("""<?xml version="1.0"?><!-- c --><svg viewBox="0 0 1 1"/>""")))
    assert(Svg.isSvg(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      svg("""<svg viewBox="0 0 1 1"/>""")))
    assert(Svg.isSvg(svg("""<ns:svg xmlns:ns="http://www.w3.org/2000/svg"/>""")))
    assert(!Svg.isSvg(svg("""<html><body>svg</body></html>""")))
    assert(!Svg.isSvg(svg("""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"/>""")))
    assert(!Svg.isSvg("plain text".getBytes))
    val t = MediaMeta.describe(svg(
      """<svg xmlns="http://www.w3.org/2000/svg" width="11" height="7"/>"""))
    assert((t.kind, t.container, t.width, t.height) == (("image", "svg", 11, 7)))
    // BMP and TIFF route through the JDK readers
    val img = new java.awt.image.BufferedImage(9, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("bmp", "tiff")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val d = MediaMeta.describe(bos.toByteArray)
      assert((d.kind, d.container, d.width, d.height) == (("image", fmt, 9, 6)), fmt)
    }
  }

  test("fixture: closed form holds for the q59 oracle; junk/truncation classify") {
    for (d <- 0L until 120L) {
      val m = Svg.imageMeta(graft.fixtures.FixtureGen.svgBytes(d)).get
      val ew = if (d % 4 == 3) 4 * (25 + d % 60) else 100 + d % 200
      val eh = if (d % 4 == 3) 4 * (15 + d % 40) else 50 + d % 150
      assert(m.width == ew && m.height == eh, s"d=$d")
      assert(m.nElements ==
        2 + d % 4 + (if (d % 3 == 0) 1 else 0) + (if (d % 5 == 0) 1 else 0))
      assert(m.hasScript == (d % 3 == 0 || d % 7 == 0))
      assert(m.hasExternalRef == (d % 5 == 0))
    }
    assert(Svg.imageMeta(null).isEmpty)
    val full = graft.fixtures.FixtureGen.svgBytes(21L)
    var cut = 1
    while (cut < full.length) {
      Svg.imageMeta(full.take(cut)) // any outcome but a throw
      cut += 7
    }
  }
}
