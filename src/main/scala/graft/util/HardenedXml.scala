package graft.util

import javax.xml.parsers.{DocumentBuilder, DocumentBuilderFactory}

/** Shared hardened XML posture for every walker (sitemap / SVG / DOCX):
  * namespace-aware, doctype declarations disallowed, XInclude off, entity
  * expansion off, silent error handler (no per-row stderr at 100 TB).
  *
  * Round-6: the builder is now a reusable THREAD-LOCAL. Each call used to
  * run `DocumentBuilderFactory.newInstance()` + feature setup + builder
  * construction PER ROW — JAXP service loading and feature validation
  * dominated the docx/svg walks (guide §1.2: per-task work). `reset()`
  * restores the builder to its factory configuration between parses, so
  * the hardened features carry over; only the error handler must be
  * re-attached (reset clears it). */
object HardenedXml {

  object Silent extends org.xml.sax.ErrorHandler {
    def warning(e: org.xml.sax.SAXParseException): Unit = ()
    def error(e: org.xml.sax.SAXParseException): Unit = ()
    def fatalError(e: org.xml.sax.SAXParseException): Unit = throw e
  }

  private val tl: ThreadLocal[DocumentBuilder] =
    ThreadLocal.withInitial(() => {
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.setXIncludeAware(false)
      dbf.setExpandEntityReferences(false)
      dbf.newDocumentBuilder()
    })

  /** A reset, silent-handlered builder for this thread. Callers parse and
    * must not retain it across rows on other threads. */
  def builder(): DocumentBuilder = {
    val b = tl.get()
    b.reset() // back to factory config; features are factory-level
    b.setErrorHandler(Silent)
    b
  }
}
