package graft

import org.apache.spark.sql.functions._

import graft.operators.Seen
import graft.sources.TableIO

/** Bloom-admission equivalence property + Iceberg DDL strings. */
class TableSeenSpec extends SparkSpec {
  import spark.implicits._

  test("property: bloom-split admission ≡ exact anti-join (no false negatives)") {
    val rnd = new scala.util.Random(1234)
    (1 to 5).foreach { trial =>
      val n = 200 + rnd.nextInt(800)
      val all = (0 until n).map(i => s"https://h${i % 7}.test/p${rnd.nextInt(n)}")
        .distinct
      val (seenPart, candPart) = all.partition(_ => rnd.nextBoolean())
      val seen = seenPart.toDF("urlNorm")
      // candidates overlap seen partially
      val cands = (candPart ++ seenPart.take(seenPart.size / 2)).toDF("urlNorm")
      val exact = Seen.admit(cands, seen).as[String].collect().sorted.toSeq
      val bloom = Seen.buildBloom(seen, 10000L, 0.01)
      val split = Seen.admitPartitioned(cands, seen, spark.sparkContext.broadcast(bloom))
        .as[String].collect().sorted.toSeq
      assert(split == exact, s"trial $trial: bloom-split differs from exact")
    }
  }

  test("iceberg DDL strings for the cluster backend") {
    val ddl = TableIO.icebergDDL("crawl.frontier",
      "urlNorm string, host string, depth int, priority bigint, epoch int, state string",
      "host", 256)
    assert(ddl ==
      "CREATE TABLE IF NOT EXISTS crawl.frontier (urlNorm string, host string, " +
        "depth int, priority bigint, epoch int, state string) USING iceberg " +
        "PARTITIONED BY (bucket(256, host))")
  }

  test("ledger: per-partition lineage rows checkpointed per fetch epoch") {
    // reuse a tiny engine run
    val params = graft.fixtures.FixtureGen.Params(hosts = 2, pagesPerHost = 15)
    val cfg = graft.model.CrawlConfig(
      seedUrls = graft.fixtures.FixtureGen.seeds(params), maxDepth = 4)
    val io = new graft.sources.ParquetSnapshotTableIO(
      spark, java.nio.file.Files.createTempDirectory("graft-ledger").toString)
    val engine = new graft.epoch.CrawlEngine(spark, cfg,
      new graft.sources.FixtureFetcher(graft.fixtures.FixtureGen.webGraphDF(spark, params)),
      graft.fixtures.FixtureGen.imagesDF(spark, params), io,
      graft.fixtures.FixtureGen.robotsMap(params))
    engine.run()
    val ledger = io.read("ledger").get
    assert(ledger.columns.toSet == Set("partitionId", "rowsIn", "rowsOk", "epoch", "phase"))
    val totalIn = ledger.agg(sum("rowsIn")).as[Long].head()
    assert(totalIn == engine.orderLog.count()) // lineage accounts every dispatch
    assert(ledger.select("epoch").distinct().count() >= 1)
  }
}
