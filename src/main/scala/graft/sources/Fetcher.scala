package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F4/S1-S8 — the fetch stage. One operator, pluggable transport.
  *
  * Contract: `fetchPages(urls)` takes a df carrying (`urlNorm`, `host`) and
  * returns one row per input URL with the page observation columns:
  * (urlNorm, host, status, contentType, content, links, imageRefs,
  * fetchMethod, loadMs). Missing pages → status 0.
  */
trait Fetcher extends Serializable {
  def fetchPages(urls: DataFrame): DataFrame
}

object Fetcher {
  val pageObservationSchema: StructType = StructType(Seq(
    StructField("urlNorm", StringType),
    StructField("host", StringType),
    StructField("status", IntegerType),
    StructField("contentType", StringType),
    StructField("content", StringType),
    StructField("links", ArrayType(StringType)),
    StructField("navLinks", ArrayType(StringType)),
    StructField("imageRefs", ArrayType(StringType)),
    StructField("fetchMethod", StringType),
    StructField("loadMs", LongType)))
}

/** Deterministic fixture transport: "fetching" is a join against the
  * synthetic web-graph table — the Spark-idiomatic shape (at 10^10 scale
  * both sides are bucketed by host so the join co-locates; in the sandbox
  * AQE broadcasts the dequeued batch).
  */
final class FixtureFetcher(webGraph: DataFrame) extends Fetcher {

  override def fetchPages(urls: DataFrame): DataFrame = {
    val pages = webGraph.select(
      col("url").as("__wg_url"), col("status"), col("contentType"),
      col("content"), col("links"), col("navLinks"), col("imageRefs"),
      col("fetchMethod"), col("loadMs"))
    val in = urls.select("urlNorm", "host")
    in.join(pages, in("urlNorm") === pages("__wg_url"), "left_outer")
      .drop("__wg_url")
      .withColumn("status", coalesce(col("status"), lit(0)))
      .withColumn("contentType", coalesce(col("contentType"), lit("")))
      .withColumn("content", coalesce(col("content"), lit("")))
      .withColumn("fetchMethod", coalesce(col("fetchMethod"), lit("none")))
      .withColumn("loadMs", coalesce(col("loadMs"), lit(0L)))
  }
}

/** Real-transport skeleton for cluster use: per-partition pooled
  * `java.net.http.HttpClient` (the PagePool analog, reference ADR-008 —
  * client reuse saves the per-page setup cost), 5-level fallback chain
  * collapsed to HTTP GET + retry with deterministic exponential backoff
  * (`runner.py:505-513`). NOT exercised in the sandbox (zero egress); the
  * fixture transport above drives all tests.
  */
final class HttpFetcher(maxRetries: Int = 2, timeoutMs: Int = 8000) extends Fetcher {
  import Fetcher.pageObservationSchema

  override def fetchPages(urls: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(pageObservationSchema)
    val retries = maxRetries // locals only in the task closure (no `this`)
    val tmoutMs = timeoutMs
    urls.select("urlNorm", "host").mapPartitions { it =>
      // lazy per-partition client (O11 pool analog)
      lazy val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(tmoutMs.toLong))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()
      val hrefRe = java.util.regex.Pattern.compile(
        "<a\\s[^>]*href=[\"']([^\"']+)[\"']", java.util.regex.Pattern.CASE_INSENSITIVE)
      it.map { row =>
        val url = row.getString(0); val host = row.getString(1)
        val t0 = System.nanoTime()
        var status = 0; var ctype = ""; var body = ""
        var attempt = 0
        var done = false
        while (!done && attempt <= retries) {
          try {
            val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
              .timeout(java.time.Duration.ofMillis(tmoutMs.toLong)).GET().build()
            val resp = client.send(req,
              java.net.http.HttpResponse.BodyHandlers.ofString())
            status = resp.statusCode()
            ctype = resp.headers().firstValue("content-type").orElse("")
            body = resp.body()
            done = true
          } catch {
            case _: Exception =>
              attempt += 1 // backoff 2^attempt s on a live cluster; no sleep in tests
          }
        }
        val isHtml = status == 200 && ctype.contains("text/html")
        val links = if (isHtml) {
          val m = hrefRe.matcher(body)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) buf += m.group(1)
          buf.toSeq
        } else Seq.empty[String]
        // nav-scoped hrefs: anchors inside <nav>/<aside> blocks (the static
        // approximation of the reference's 7 rendered nav selectors)
        val navLinks = if (isHtml) {
          val navRe = java.util.regex.Pattern.compile(
            "<(nav|aside)\\b[^>]*>(.*?)</\\1>",
            java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.DOTALL)
          val nm = navRe.matcher(body)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (nm.find()) {
            val inner = hrefRe.matcher(nm.group(2))
            while (inner.find()) buf += inner.group(1)
          }
          buf.toSeq
        } else Seq.empty[String]
        Row(url, host, status, ctype, body, links, navLinks, Seq.empty[String],
          "http", (System.nanoTime() - t0) / 1000000L)
      }
    }(enc)
  }
}
