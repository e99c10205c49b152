package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev soak: the full engine at ~10× the golden-fixture scale — validates
  * epoch-loop behavior (commit growth, budget epochs, skew host) beyond the
  * test sizes and reports end-to-end URLs/sec. */
object Soak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val params = graft.fixtures.FixtureGen.Params(
      hosts = 9, pagesPerHost = 300, skew = 5) // 300*5 + 300*8 = 3900 pages
    val cfg = graft.model.CrawlConfig(
      seedUrls = graft.fixtures.FixtureGen.seeds(params),
      maxDepth = 8, epochSeconds = 120) // budget 240/host-epoch; host1 60
    val io = new graft.sources.ParquetSnapshotTableIO(
      spark, java.nio.file.Files.createTempDirectory("graft-soak").toString)
    val engine = new graft.epoch.CrawlEngine(spark, cfg,
      new graft.sources.FixtureFetcher(graft.fixtures.FixtureGen.webGraphDF(spark, params)),
      graft.fixtures.FixtureGen.imagesDF(spark, params), io,
      graft.fixtures.FixtureGen.robotsMap(params),
      sitemaps = Some(graft.fixtures.FixtureGen.sitemapsDF(spark, params)))
    val t0 = System.nanoTime()
    engine.run()
    val sec = (System.nanoTime() - t0) / 1e9
    val urls = engine.orderLog.count()
    val fetched = engine.fetched.count()
    val epochs = engine.orderLog.select("epoch").distinct().count()
    val invalid = io.lastCounters.getOrElse("invalid_rows", -1L)
    println(f"SOAK urls=$urls fetched=$fetched epochs=$epochs sec=$sec%.1f " +
      f"rps=${urls / sec}%.1f invalid_last_epoch=$invalid")
    engine.orderLog.groupBy("disposition").count().show()
    spark.stop()
  }
}
