package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.urlfns

/** Dev smoke driver: exercises the library surface against the driver
  * testdata through a real SparkSession (codegen path, SQL registration).
  * Not part of the engine; used by /verify flows.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    urlfns.register(spark)

    // Synthesize a URL column from real testdata and canonicalize it via
    // both the Column API and SQL.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val urls = docs.select(
      concat(lit("HTTPS://Site-"), ($"doc_id" % 5).cast("string"),
        lit(".TEST/Docs/"), $"doc_id".cast("string"),
        when($"doc_id" % 3 === 0, lit("/")).otherwise(lit("")),
        when($"doc_id" % 2 === 0, lit("#frag")).otherwise(lit(""))).as("url"))
    val canon = urls.select($"url", urlfns.url_canonicalize($"url").as("canon"),
      urlfns.url_host(urlfns.url_canonicalize($"url")).as("host"))
    canon.show(6, truncate = false)
    canon.explain("formatted")

    urls.createOrReplaceTempView("urls")
    val viaSql = spark.sql(
      "SELECT url, url_canonicalize(url) AS canon, url_path(url) AS path FROM urls LIMIT 5")
    viaSql.show(5, truncate = false)

    // url_resolve through codegen
    val resolved = urls.limit(3).select(
      urlfns.url_resolve(lit("https://site-0.test/a/b/"), lit("../x")).as("r1"),
      urlfns.url_resolve($"url", lit("child/page")).as("r2"))
    resolved.show(3, truncate = false)

    // probes: null input, malformed URLs, non-http schemes
    val probes = Seq(
      (null: String), "", "::::", "mailto:a@b.c", "https://UPPER.com/Path/",
      "a".repeat(3000), "http://h/p;params?q#f").toDF("u")
      .select($"u", urlfns.url_canonicalize($"u").as("c"))
    probes.show(10, truncate = false)

    val n = canon.where($"canon".startsWith("https://site-")).count()
    println(s"SMOKE_OK canonicalized=$n of ${urls.count()}")
    spark.stop()
  }
}
