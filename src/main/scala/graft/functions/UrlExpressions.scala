package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.util.PyUrl

/** Catalyst expressions for RFC-3986 URL work (north-rule requirement:
  * "RFC-3986 URL canonicalization expressed as Catalyst expressions").
  *
  * These are native `Expression`s with `doGenCode` (not Scala UDFs) so they
  * stay inside whole-stage codegen and null-handling is managed by Catalyst.
  * Semantics delegate to [[graft.util.PyUrl]], the exact transcription of
  * the reference's `normalize_url` (`src/crawler/discovery.py:25-76`) and
  * `urljoin` link absolutization (`discovery.py:115`).
  */
case class UrlCanonicalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_canonicalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyUrl.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.util.PyUrl.canonicalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

/** RFC 3986 §5 relative-reference resolution: `url_resolve(base, href)`. */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_resolve"

  override def nullSafeEval(base: Any, href: Any): Any =
    UTF8String.fromString(PyUrl.urljoin(
      base.asInstanceOf[UTF8String].toString,
      href.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.util.PyUrl.urljoin($b.toString(), $h.toString()))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlResolve =
    copy(left = l, right = r)
}

/** Host (netloc) under python-urlparse semantics (Spark's `parse_url`
  * differs on edge cases like missing scheme, so identity-critical host
  * extraction uses this). */
case class UrlHost(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_host"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyUrl.host(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.util.PyUrl.host($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}

/** Path component under python-urlparse semantics. */
case class UrlPath(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_path"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyUrl.path(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.util.PyUrl.path($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): UrlPath =
    copy(child = newChild)
}

/** Scheme component (lowercased by parse, python semantics). */
case class UrlScheme(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_scheme"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyUrl.urlparse(input.asInstanceOf[UTF8String].toString).scheme)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.util.PyUrl.urlparse($c.toString(), \"\").scheme())")

  override protected def withNewChildInternal(newChild: Expression): UrlScheme =
    copy(child = newChild)
}

/** S4 — the reference link-extractor's per-href transform
  * (`discovery.py:110-121`): skip hrefs containing #/javascript:/mailto:/tel:,
  * absolutize against the page URL, keep same-domain http(s), rebuild as
  * scheme://netloc+path(+?query). Returns "" for dropped hrefs (filter on
  * nonempty). One parse instead of five chained expressions. */
case class UrlExtractClean(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_extract_clean"

  override def nullSafeEval(pageUrl: Any, href: Any, domain: Any): Any =
    UTF8String.fromString(PyUrl.extractClean(
      pageUrl.asInstanceOf[UTF8String].toString,
      href.asInstanceOf[UTF8String].toString,
      domain.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, h, d) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.util.PyUrl.extractClean($p.toString(), $h.toString(), $d.toString()))")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UrlExtractClean =
    copy(first = f, second = s, third = t)
}

/** S2 — the nav-parse per-href transform (startswith-skip semantics +
  * normalize; `discovery.py:305-325`). Returns "" for dropped hrefs. */
case class UrlNavClean(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_nav_clean"

  override def nullSafeEval(pageUrl: Any, href: Any, domain: Any): Any =
    UTF8String.fromString(PyUrl.navClean(
      pageUrl.asInstanceOf[UTF8String].toString,
      href.asInstanceOf[UTF8String].toString,
      domain.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, h, d) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.util.PyUrl.navClean($p.toString(), $h.toString(), $d.toString()))")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UrlNavClean =
    copy(first = f, second = s, third = t)
}

/** Column-API + SQL registration surface for the URL expressions. */
object urlfns {
  def url_canonicalize(c: Column): Column = graftshim.toColumn(UrlCanonicalize(graftshim.toExpression(c)))
  def url_resolve(base: Column, href: Column): Column = graftshim.toColumn(UrlResolve(graftshim.toExpression(base), graftshim.toExpression(href)))
  def url_host(c: Column): Column = graftshim.toColumn(UrlHost(graftshim.toExpression(c)))
  def url_path(c: Column): Column = graftshim.toColumn(UrlPath(graftshim.toExpression(c)))
  def url_scheme(c: Column): Column = graftshim.toColumn(UrlScheme(graftshim.toExpression(c)))
  def url_extract_clean(pageUrl: Column, href: Column, domain: Column): Column =
    graftshim.toColumn(UrlExtractClean(graftshim.toExpression(pageUrl),
      graftshim.toExpression(href), graftshim.toExpression(domain)))
  def url_nav_clean(pageUrl: Column, href: Column, domain: Column): Column =
    graftshim.toColumn(UrlNavClean(graftshim.toExpression(pageUrl),
      graftshim.toExpression(href), graftshim.toExpression(domain)))

  /** Register `url_canonicalize` / `url_resolve` / `url_host` / `url_path`
    * for SQL use in this session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("url_canonicalize",
      (es: Seq[Expression]) => UrlCanonicalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("url_resolve",
      (es: Seq[Expression]) => UrlResolve(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("url_host",
      (es: Seq[Expression]) => UrlHost(es.head), "built-in")
    reg.createOrReplaceTempFunction("url_path",
      (es: Seq[Expression]) => UrlPath(es.head), "built-in")
    reg.createOrReplaceTempFunction("url_scheme",
      (es: Seq[Expression]) => UrlScheme(es.head), "built-in")
  }
}
