package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream
import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.urlfns

/** S1 — sitemap seed-expansion (reference `try_sitemap`,
  * `src/crawler/discovery.py:343-513`): sitemap.xml / sitemap_index.xml,
  * gzip `.xml.gz` decompression (`:417-425`), recursive sitemap-index
  * expansion (`:437-449`), same-domain + base-path filter (`:459-465`),
  * error-tolerant parse (invalid XML → empty, `:427-432`).
  *
  * XML parsing uses the JDK DOM parser with DTDs/external entities disabled
  * — the XXE posture of the reference's defusedxml (`discovery.py:8`).
  */
object Sitemaps {

  private val SitemapNs = "http://www.sitemaps.org/schemas/sitemap/0.9"

  /** Parse one sitemap body → (page urls, child sitemap urls). Invalid XML
    * or wrong root → both empty (error tolerance). */
  def parse(bytes: Array[Byte], gzipped: Boolean): (Seq[String], Seq[String]) = {
    try {
      val raw =
        if (gzipped) new GZIPInputStream(new ByteArrayInputStream(bytes)).readAllBytes()
        else bytes
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.setXIncludeAware(false)
      dbf.setExpandEntityReferences(false)
      val doc = dbf.newDocumentBuilder().parse(new ByteArrayInputStream(raw))
      val root = doc.getDocumentElement
      def locs(parent: String): Seq[String] = {
        val nodes = doc.getElementsByTagNameNS(SitemapNs, parent)
        (0 until nodes.getLength).flatMap { i =>
          val e = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
          val ls = e.getElementsByTagNameNS(SitemapNs, "loc")
          (0 until ls.getLength).map(j => ls.item(j).getTextContent.trim)
        }
      }
      root.getLocalName match {
        case "urlset"       => (locs("url"), Seq.empty)
        case "sitemapindex" => (Seq.empty, locs("sitemap"))
        case _              => (Seq.empty, Seq.empty)
      }
    } catch { case _: Exception => (Seq.empty, Seq.empty) }
  }

  /** Expand a sitemap table fully: iterate the pending-sitemaps frontier
    * until no sitemap-index children remain (the same bounded-loop shape as
    * crawl epochs), then same-domain + base-path filter + canonicalize.
    *
    * `sitemaps`: (sitemap_url string, body binary, gzipped boolean) — the
    * fetch layer's responsibility; this operator is the parse/expand plan.
    * Returns distinct page urlNorms under `baseUrl`'s domain and path.
    */
  def expand(sitemaps: DataFrame, rootSitemapUrls: Seq[String], baseUrl: String,
      maxRounds: Int = 8): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    val parsed = sitemaps.select($"sitemap_url", $"body", $"gzipped")
      .as[(String, Array[Byte], Boolean)]
      .map { case (u, b, gz) => val (urls, children) = parse(b, gz); (u, urls, children) }
      .toDF("sitemap_url", "urls", "children")
      .cache()
    var pending = rootSitemapUrls.toDF("sitemap_url")
    var done = spark.emptyDataFrame.select() // placeholder
    var collected = Seq.empty[DataFrame]
    var round = 0
    var continue = true
    var visited = pending
    while (continue && round < maxRounds) {
      val batch = pending.join(parsed, Seq("sitemap_url"))
      collected :+= batch.select(explode($"urls").as("url"))
      val children = batch.select(explode($"children").as("sitemap_url")).distinct()
        .join(visited, Seq("sitemap_url"), "left_anti")
      if (children.isEmpty) continue = false
      else { visited = visited.unionByName(children); pending = children; round += 1 }
    }
    val base = graft.util.PyUrl.urlparse(baseUrl)
    val basePath = { var p = base.path; while (p.endsWith("/")) p = p.dropRight(1); p }
    val all = collected.reduce(_ unionByName _)
    all.select(urlfns.url_canonicalize($"url").as("urlNorm"))
      .where(urlfns.url_host($"urlNorm") === lit(base.netloc))
      .where(startswith(urlfns.url_path($"urlNorm"), lit(basePath)))
      .distinct()
  }
}
