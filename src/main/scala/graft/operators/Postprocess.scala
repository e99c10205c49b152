package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's post-scrape output pipeline as one composable stage
  * (`src/jobs/runner.py:543-620`): ok pages → chunk_markdown (C9) →
  * 3-tier classify (O3/O4) → LLM cleanup applied ONLY to cleanup/heavy
  * chunks (skip rows pass through untouched — the ~30% call reduction the
  * reference ships as ADR-003). The cleaner is pluggable like the
  * relevance scorer: identity by default (deterministic, test-stable), an
  * LLM client on a real deployment.
  *
  * Input contract: a page table carrying a URL column and a markdown
  * content column — the engine's `page_cache` / ok `fetched` projections
  * qualify directly. Output: one row per chunk
  * (url, chunk_idx, level, chunk) — the reference's per-page chunk list,
  * flattened relationally.
  */
object Postprocess {

  /** Pluggable chunk cleaner (the LLM-call analog; batch-friendly like
    * BatchedScorer if a deployment needs it). */
  trait ChunkCleaner extends Serializable {
    def clean(chunk: String, level: String): String
  }

  /** Default: no-op (crawl_model=None parity — cleanup disabled). */
  object IdentityCleaner extends ChunkCleaner {
    override def clean(chunk: String, level: String): String = chunk
  }

  /** ok pages → (url, chunk_idx, level, chunk): chunked, classified, and
    * selectively cleaned. The cleaner runs only where level != skip —
    * expressed as a when() so Catalyst keeps the expensive branch gated. */
  def chunksTable(pages: DataFrame, urlCol: Column, markdownCol: Column,
      cleaner: ChunkCleaner = IdentityCleaner): DataFrame = {
    val cleanUdf = udf((c: String, lvl: String) => cleaner.clean(c, lvl))
    val chunked = Chunker.chunks(
      pages.select(urlCol.as("url"), markdownCol.as("md")), col("url"), col("md"))
    chunked
      .withColumn("level", Cleanup.classify(col("chunk")))
      .withColumn("chunk",
        when(col("level") === "skip", col("chunk")) // O3/O4: never call the
          .otherwise(cleanUdf(col("chunk"), col("level")))) // cleaner on skip
      .select(col("id").as("url"), col("chunk_idx"), col("level"), col("chunk"))
  }

  /** Commit the post-scrape `chunks` table for a COMPLETED crawl — ONE
    * copy shared by the `Crawl` facade and the `JobManager` worker (the
    * reference runs this pipeline per job, `runner.py:543-620`, so served
    * jobs must get it too, not only facade runs). Skips when the manifest
    * tail is ALREADY `postprocess` (same guard pattern as the engine's
    * completion marker), so resume over a finished state dir never re-runs
    * the whole chunk→classify→cleanup pass. A crawl with zero ok pages
    * stamps the phase with an EMPTY chunks table — the terminal phase must
    * land regardless, or the job would stay "postprocess pending" and be
    * revivable forever as a noop. Manifest counters re-commit (carry
    * forward) — a bare commit would wipe them from the manifest, losing
    * the crawl's committed progress counters to any cross-process reader. */
  def commitChunks(spark: org.apache.spark.sql.SparkSession,
      engine: graft.epoch.CrawlEngine, io: graft.sources.TableIO,
      cleaner: ChunkCleaner = IdentityCleaner): Unit =
    if (!io.lastCommitted.map(_._1).contains("postprocess")) {
      val chunks = engine.table("page_cache")
        .map(pc => chunksTable(pc, col("urlNorm"), col("content"), cleaner))
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("url",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("chunk_idx",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("level",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("chunk",
              org.apache.spark.sql.types.StringType)))))
      io.commit("postprocess", 0, tables = Map("chunks" -> chunks),
        counters = io.lastCounters)
      // the commit bypassed the engine's commitTracked — refresh its poll
      // caches so status/SSE report the terminal `postprocess` phase
      engine.noteExternalCommit()
    }
}
