package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{fingerprintfns, urlfns, Hashing, ImageOps}
import graft.operators.{Dedup, Frontier, Robots, Seen, Similarity, TextAnalysis, UrlFilters}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data pipeline operators), each with an
  * equivalent DuckDB-runnable oracle in [[SparkEntry.oracleSql]] where the
  * semantics are ANSI-SQL-expressible. Column names and row order match the
  * oracle exactly. Ops that aren't hand-writable ANSI SQL (LSH/IVF ANN,
  * simhash, fingerprint, image validation, the crawl engine itself) get
  * GENERATED oracles from [[OracleGen]] — re-expressed DuckDB math,
  * pure-Scala recomputation, or reference-simulator VALUES — so all 34
  * queries are driver-checkable.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")
  /** The documents scan is ONE small parquet file = one input task; the
    * per-row decode-UDF queries (q35+) repartition by doc_id FIRST so
    * their ~ms/doc fixture+decode chains run cluster-wide instead of
    * serialized on a single core. Explicit partition count — the q32
    * lesson: AQE would coalesce a few-MB by-column repartition back to
    * one partition, re-serializing the UDF stage. Row-wise maps + the
    * final orderBy make this a pure plan change, never a result change. */
  /** Scale-adaptive spread count (round 6, guide §2): at least the
    * cluster's parallelism, but NEVER fewer partitions than the input
    * already has — on a real cluster where the corpus scan is already
    * split-parallel this never funnels it down to the core count, while
    * in the sandbox (one-file scan = 1-2 partitions) it fans the per-row
    * work out. Explicit count → REPARTITION_BY_NUM, which AQE never
    * coalesces (the q32 lesson). */
  private def spreadByDoc(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(
      math.max(s.sparkContext.defaultParallelism, df.rdd.getNumPartitions),
      col("doc_id"))
  private def docsSpread(s: SparkSession, dir: String) =
    spreadByDoc(s, docs(s, dir))
  private def embs(s: SparkSession, dir: String) = s.read.parquet(s"$dir/embeddings.parquet")
  private def li(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def ords(s: SparkSession, dir: String) = s.read.parquet(s"$dir/orders.parquet")
  private def cust(s: SparkSession, dir: String) = s.read.parquet(s"$dir/customer.parquet")
  private def nat(s: SparkSession, dir: String) = s.read.parquet(s"$dir/nation.parquet")
  private def part(s: SparkSession, dir: String) = s.read.parquet(s"$dir/part.parquet")
  /** `events.parquet` writes `ts` with `isAdjustedToUTC=false`; whether Spark
    * infers it as TIMESTAMP_NTZ or TIMESTAMP_LTZ is decided by the *session*
    * conf `spark.sql.parquet.inferTimestampNTZ.enabled`, outside the query's
    * control. Under LTZ inference the raw micros are read as a UTC instant
    * while `hour()`/`unix_date()` extract fields in the session zone — a
    * whole-zone-offset shift in q08/q09 outputs. Pinning the read schema to
    * TIMESTAMP_NTZ overrides the conf, so q08/q09 are byte-identical in any
    * harness session (zone or inference setting). */
  private def events(s: SparkSession, dir: String) =
    s.read
      .schema("event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")

  /** round(sum(double)*100) is a latent cross-engine lottery: double
    * addition is not associative, Spark's partial-merge order is
    * nondeterministic while DuckDB sums sequentially, so a group total
    * landing near a half-cent boundary could round differently per
    * engine/run. Each ROW casts to DECIMAL first — both engines compute
    * the same IEEE double and round it to the same 6 decimals — making
    * the aggregate exact and order-independent. The oracle SQL casts
    * identically. */
  private def dec6(c: Column): Column = c.cast("decimal(30,6)")
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Zone-free epoch micros for TIMESTAMP_NTZ (see
    * [[graft.functions.TimeFns.ntzEpochMicros]] — the q09 fix). */
  private def ntzMicros(c: Column): Column =
    graft.functions.TimeFns.ntzEpochMicros(c)

  // ---- shared synthesized-input SQL (identical text runs in Spark & DuckDB) ----

  /** q10 input: URL spellings exercising every canonicalization rule. */
  private val synthUrl: String =
    "concat('HTTPS://Site-', doc_id % 7, '.TEST', " +
      "CASE WHEN doc_id % 4 = 0 THEN concat('/Docs/', doc_id, '/') " +
      "WHEN doc_id % 4 = 1 THEN concat('/docs/d', doc_id, '#frag') " +
      "WHEN doc_id % 4 = 2 THEN concat('/a/./b/../c', doc_id) " +
      "ELSE concat('/q', doc_id, '?x=1&y=2') END)"

  /** q11 input: mixed-host corpus for the deterministic filter. */
  private val synthCorpus: String =
    "CASE WHEN doc_id % 11 = 0 THEN concat('https://site-0.test/docs/blog/p', doc_id) " +
      "WHEN doc_id % 11 = 1 THEN concat('https://site-0.test/docs/file', doc_id, '.PDF') " +
      "WHEN doc_id % 11 = 2 THEN concat('https://site-0.test/docs/es/p', doc_id) " +
      "WHEN doc_id % 11 = 3 THEN concat('https://site-0.test/docs/en/p', doc_id) " +
      "WHEN doc_id % 11 = 4 THEN concat('https://other.test/docs/p', doc_id) " +
      "WHEN doc_id % 11 = 5 THEN concat('https://site-0.test/outside/p', doc_id) " +
      "WHEN doc_id % 11 = 6 THEN concat('https://site-0.test/docs/p', doc_id, '/') " +
      "ELSE concat('https://site-0.test/docs/p', doc_id) END"

  /** q12 input: paths exercising robots longest-match precedence. */
  private val synthPath: String =
    "CASE WHEN doc_id % 5 = 0 THEN concat('/docs/private/p', doc_id) " +
      "WHEN doc_id % 5 = 1 THEN concat('/docs/private/ok/p', doc_id) " +
      "WHEN doc_id % 5 = 2 THEN concat('/docs/pub/p', doc_id) " +
      "WHEN doc_id % 5 = 3 THEN concat('/tmp/x', doc_id) " +
      "ELSE concat('/docs/p', doc_id) END"

  /** q13 input: text with injected bot-check phrases (0 → 2 patterns =
    * blocked; 1 → a single pattern = NOT blocked — threshold test). */
  private val synthContent: String =
    "concat(coalesce(text, ''), CASE WHEN doc_id % 17 = 0 THEN ' Checking your browser... Cloudflare Ray ID: 7x' " +
      "WHEN doc_id % 17 = 1 THEN ' this page discusses captcha topics' ELSE '' END)"

  private val synthFrontierUrl: String =
    "concat('https://site-', doc_id % 5, '.test/p', doc_id)"
  private val synthFrontierHost: String = "concat('site-', doc_id % 5, '.test')"

  /** augmented docs: exact copies of every 10th doc under id+1000000. */
  private val augDocsSql: String =
    "SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0"

  /** augmented docs: near-dup (mutated head) copies of every 10th doc. */
  private val augNearSql: String =
    "SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 1000000 AS doc_id, concat('mutate ', substring(text, 8)) AS text " +
      "FROM documents WHERE doc_id % 10 = 0"

  /** q24/q34 shared construction: embeddings augmented with exact copies
    * (+1e6) and perturbed near-copies (+2e6, x·0.995+0.002) of vec_id < 25,
    * then multi-band LSH pairs filtered to same-base candidates. BOTH
    * queries and BOTH oracles assume this exact pair set — one definition. */
  private def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val lt25 = e.where(col("vec_id") < 25)
    val aug = e
      .unionByName(lt25.select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
      .unionByName(lt25.select((col("vec_id") + 2000000).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.995) + lit(0.002)).as("embedding")))
    Dedup.embeddingPairs(aug, col("vec_id"), col("embedding"),
        dim = 64, numBands = 16, bandPlanes = 4, threshold = 0.95)
      .where(col("id_a") % 1000000 === col("id_b") % 1000000)
  }

  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (A1/A2, W1-W4, J1-J6, U1-U3 shapes) ----
    "q01_pricing_agg" -> ((s, d) => {
      li(s, d).groupBy("l_returnflag", "l_linestatus").agg(
          cents(sum(dec6(col("l_quantity")))).as("sum_qty_c"),
          cents(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))).as("revenue_c"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q02_topk_per_group" -> ((s, d) => {
      ords(s, d).withColumn("rnk", row_number().over(
          Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))))
        .where(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
        .orderBy("o_custkey", "rnk")
    }),
    "q03_join_agg_nation" -> ((s, d) => {
      ords(s, d)
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), cents(sum(dec6(col("o_totalprice")))).as("total_c"))
        .orderBy("n_name")
    }),
    "q04_anti_join_unsold_parts" -> ((s, d) => {
      part(s, d).join(li(s, d), col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey").orderBy("p_partkey")
    }),
    "q05_semi_join_active_custs" -> ((s, d) => {
      cust(s, d).join(ords(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "q06_except_custs_no_orders" -> ((s, d) => {
      cust(s, d).select("c_custkey")
        .except(ords(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    }),
    "q07_running_sum_supplier" -> ((s, d) => {
      li(s, d).where(col("l_suppkey") <= 2)
        .withColumn("running_c", cents(sum(dec6(col("l_extendedprice"))).over(
          Window.partitionBy("l_suppkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_c")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),
    "q08_events_hourly" -> ((s, d) => {
      // NOT date_trunc("hour", ts): that builtin casts NTZ→LTZ through the
      // session zone (see TimeFns.ntzTruncHour) — q08 only survived
      // whole-hour driver zones by luck before round 4.
      events(s, d).groupBy(graft.functions.TimeFns.ntzTruncHour(col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), cents(sum(dec6(col("value")))).as("value_c"))
        .orderBy("hour", "event_type")
    }),
    "q09_sessionize" -> ((s, d) => {
      // events.ts is TIMESTAMP_NTZ; micros come from [[ntzMicros]] (pure
      // wall-clock fields) so no session-timezone conversion exists on
      // either side of the oracle comparison.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("us", ntzMicros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"))
        .orderBy("user_id", "session_id")
    }),

    // ---- URL / crawl operators (F1/F2/F5/F7, C1-C4, W3, J1/J6) ----
    "q10_url_canonicalize" -> ((s, d) => {
      urlfns.register(s)
      docs(s, d).select(col("doc_id"), expr(synthUrl).as("url"))
        .select(col("doc_id"), col("url"),
          urlfns.url_canonicalize(col("url")).as("canon"),
          urlfns.url_host(urlfns.url_canonicalize(col("url"))).as("host"))
        .orderBy("doc_id")
    }),
    "q11_url_filter" -> ((s, d) => {
      val corpus = docs(s, d).select(expr(synthCorpus).as("url"))
      UrlFilters.filterUrls(corpus, col("url"), "https://site-0.test/docs", "en")
    }),
    "q12_robots_admission" -> ((s, d) => {
      import s.implicits._
      val rules = Seq(
        ("site-0.test", "disallow", "/docs/private/", 14),
        ("site-0.test", "allow", "/docs/private/ok", 16),
        ("site-0.test", "disallow", "/tmp", 4))
        .toDF("host", "kind", "pathPrefix", "prefixLen")
      val urls = docs(s, d).select(lit("site-0.test").as("host"), expr(synthPath).as("path"))
      Robots.admitJoin(urls, rules).select("path").orderBy("path")
    }),
    "q13_blocked_detect" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), expr(synthContent).as("content"))
        .select(col("doc_id"), UrlFilters.isBlockedResponse(col("content")).as("blocked"))
        .orderBy("doc_id")
    }),
    "q14_content_hash" -> ((s, d) => {
      // docsSpread (round 6): the PyWs regexp_replace chain + md5 + sha2
      // ran on the one-task scan (~1.8 s serialized); plan-only spread.
      docsSpread(s, d).select(col("doc_id"),
          Hashing.contentHash(col("text")).as("md5h"),
          Hashing.cacheKey(expr(synthFrontierUrl)).as("cache_key"))
        .orderBy("doc_id")
    }),
    "q15_politeness_dequeue" -> ((s, d) => {
      import s.implicits._
      val frontier = docs(s, d).select(
        expr(synthFrontierUrl).as("urlNorm"), expr(synthFrontierHost).as("host"))
      val budgets = (0 until 5).map(h => (s"site-$h.test", 7)).toDF("host", "budget")
      Frontier.dequeue(Frontier.prioritize(frontier), budgets, 7)
        .select("host", "priority", "urlNorm").orderBy("host", "priority")
    }),
    "q16_frontier_admission" -> ((s, d) => {
      val all = docs(s, d).select(expr(synthFrontierUrl).as("urlNorm"))
      val seen = docs(s, d).where(col("doc_id") % 3 === 0)
        .select(expr(synthFrontierUrl).as("urlNorm"))
      val bloom = Seen.buildBloom(seen, 100000L, 0.001)
      // the 10^10 shape (seen-Bloom candidate routing + candidate-Bloom
      // seen-side prune), driver-verified ≡ the plain anti-join oracle.
      // One-shot query context: broadcast lifetime is left to the
      // ContextCleaner here (two small blooms per invocation); the engine
      // path manages both broadcasts' lifecycles explicitly.
      Seen.admitAtScale(all, seen, s.sparkContext.broadcast(bloom),
        expectedCandidates = 100000L, fpp = 0.001)
        .orderBy("urlNorm")
    }),
    "q17_cache_join" -> ((s, d) => {
      val frontier = docs(s, d).select(col("doc_id"), expr(synthFrontierUrl).as("url"))
      val cache = docs(s, d).where(col("doc_id") % 4 === 1)
        .select(expr(synthFrontierUrl).as("url"), lit(1).as("c_marker"))
      frontier.join(cache, Seq("url"), "left_outer")
        .select(col("doc_id"), col("url"), col("c_marker").isNotNull.as("cache_hit"))
        .orderBy("doc_id")
    }),

    // ---- text analysis ----
    "q18_langid" -> ((s, d) => {
      // docsSpread (round 6): five regexp_count sweeps per row ran on the
      // ONE-task documents scan — ~1 s serialized on a single core. Same
      // plan-only spread as q32/q35+; orderBy pins the output order.
      docsSpread(s, d).select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),
    "q19_quality_score" -> ((s, d) => {
      // docsSpread (round 6): same single-task-scan spread as q18 (the
      // split/regexp gates ran serialized); plan-only, orderBy pins output.
      docsSpread(s, d).select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("score"))
        .orderBy("doc_id")
    }),
    "q20_token_counts" -> ((s, d) => {
      docs(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws"),
          TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"))
        .orderBy("doc_id")
    }),

    // ---- dedup family ----
    "q21_dedup_exact" -> ((s, d) => {
      val base = docs(s, d).select("doc_id", "text")
      // repartition (round 6): the contentHash normalize+md5 work ran on
      // the 2-task union of one-task scans (~1.8 s serialized); plan-only
      // spread before the hash, same idiom as docsSpread.
      val aug = spreadByDoc(s, base.unionByName(base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))))
      Dedup.exact(aug, col("doc_id"), col("text"))
        .where(col("dup_count") >= 2)
        .select("keep_id", "dup_count").orderBy("keep_id")
    }),
    "q22_minhash_neardup" -> ((s, d) => {
      val base = docs(s, d).select("doc_id", "text")
      // repartition (round 6): the single-pass minhash UDF + shingle
      // sweep ran on the 2-task union (~3.3 s serialized); plan-only
      // spread before the banding, same idiom as docsSpread.
      val aug = spreadByDoc(s, base.unionByName(base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(lit("mutate "), expr("substring(text, 8)")).as("text"))))
      // 24 bands (not the default 16): the oracle is EXACT jaccard ≥ 0.5,
      // so banding recall must be a near-certainty down to j = 0.5 even
      // for the shortest fixture docs (~44 chars → j ≈ 0.57 for the head
      // mutation; miss prob (1-j²)^24 ≈ 8e-5 vs 2e-3 at 16 bands — a
      // fixture-regen lottery the driver gate must not be exposed to)
      Dedup.minhashPairs(aug, col("doc_id"), col("text"),
          shingleK = 5, numBands = 24, rowsPerBand = 2, threshold = 0.5)
        .where(col("id_b") === col("id_a") + 1000000)
        .select("id_a", "id_b", "jaccard").orderBy("id_a")
    }),
    "q23_embedding_topk" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 8), 10, dim = Some(64))
        .select("qid", "id", "rank").orderBy("qid", "rank")
    }),
    "q24_embedding_neardup" -> ((s, d) => {
      // exact copies (+1e6) AND perturbed near-copies (+2e6) at threshold
      // 0.95 — the multi-band recall case single-band LSH structurally
      // missed (round-1 verdict What's-wrong #4)
      nearDupPairs(s, d).select("id_a", "id_b").orderBy("id_a", "id_b")
    }),
    "q32_chunking" -> ((s, d) => {
      // C9 — semantic H1-H3 chunking over constructed markdown; the oracle
      // rebuilds the expected sections from the same construction. Input is
      // built in ONE UDF pass: the equivalent SQL expression repeats
      // `substr(repeat(text,50),1,2000)` four times and CollapseProject
      // inlines each (~110 KB of string churn per row — measured 21 s).
      // repeat-until-2000, NOT a fixed repeat count: with repeat(·,60) a
      // doc under 34 chars builds md ≤ 6000 chars, the chunker's
      // whole-text early-return emits ONE chunk, and the oracle's
      // unconditional 3 rows go red — a fixture-regen lottery. Pinning t
      // to exactly 2000 chars for ANY non-empty text (same formula in the
      // oracle SQL) removes the length dependence; the ≥1-char filter is
      // shared with the oracle too (null/empty text has no defined t).
      val mdUdf = udf { (docId: Long, text: String) =>
        val sb = new java.lang.StringBuilder(2100)
        while (sb.length < 2000) sb.append(text)
        val t = sb.substring(0, 2000) // BMP-only corpus: chars == codepoints
        s"# Intro $docId\n\n$t\n\n## Part A $docId\n\n$t" +
          s"\n\n#### deep $docId\n\n$t\n\n### Part B $docId\n\n$t"
      }
      // the documents scan is one small parquet file = ONE task; spread the
      // ~2 ms/doc UDF chain across the cluster before it runs. Explicit
      // partition count: AQE would coalesce a by-column repartition of a
      // few MB back to one partition, re-serializing the UDF stage.
      val df = spreadByDoc(s, docs(s, d).where(length(col("text")) >= 1))
        .select(col("doc_id"), mdUdf(col("doc_id"), col("text")).as("md"))
      graft.operators.Chunker.chunks(df, col("doc_id"), col("md"))
        .select(col("id").as("doc_id"), col("chunk_idx"), col("chunk"))
        .orderBy("doc_id", "chunk_idx")
    }),
    "q33_cleanup_classify" -> ((s, d) => {
      // O3/O4 — 3-tier skip/cleanup/heavy classification as a column.
      // docsSpread (round 6): synthCleanup repeats text ~60× (≈18 KB/row)
      // and classify regex-sweeps it — ~2.5 s serialized on the one-task
      // scan; plan-only spread, orderBy pins the output.
      docsSpread(s, d).select(col("doc_id"), expr(synthCleanup).as("md"))
        .select(col("doc_id"), graft.operators.Cleanup.classify(col("md")).as("level"))
        .orderBy("doc_id")
    }),
    "q31_structured_blocks" -> ((s, d) => {
      // D5/S11 — typed content blocks from synthetic HTML (shared CASE math
      // with the oracle, which reconstructs the expected blocks directly)
      // docsSpread (round 6): the block parser's regex walk ran on the
      // one-task scan (~1.4 s serialized); plan-only spread.
      val pages = docsSpread(s, d).select(col("doc_id"), expr(synthHtml).as("html"))
      val st = graft.operators.Structured.toStructured(pages, col("doc_id"), col("html"))
      st.select(col("url").as("doc_id"), col("title"),
          posexplode(col("blocks")).as(Seq("pos0", "b")))
        .select(col("doc_id"), col("title"), (col("pos0") + 1).cast("int").as("pos"),
          col("b.blockType").as("block_type"), col("b.content").as("content"),
          col("b.level").as("level"), col("b.language").as("language"),
          col("b.alt").as("alt"))
        .orderBy("doc_id", "pos")
    }),

    "q34_neardup_resolve" -> ((s, d) => {
      // pairs → keep/drop decisions (connected components, min-id keeper):
      // the step that turns q24's near-dup PAIRS into a dedup verdict table
      Dedup.resolveKeepers(nearDupPairs(s, d)).select("id", "keep_id").orderBy("id")
    }),

    // ---- generated oracles (OracleGen) ----
    "q25_ann_lsh" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.lshTopK(e, e.where(col("vec_id") < 8), 10, dim = 64, numPlanes = 6)
        .select("qid", "id", "rank").orderBy("qid", "rank")
    }),
    "q30_ann_ivf" -> ((s, d) => {
      val e = embs(s, d)
      val model = graft.operators.Ivf.train(e, dim = 64, k = 8, iters = 3)
      graft.operators.Ivf.topK(e, e.where(col("vec_id") < 8), model, 10, nProbe = 3)
        .select("qid", "id", "rank").orderBy("qid", "rank")
    }),
    "q26_simhash_neardup" -> ((s, d) => {
      val base = docs(s, d).select("doc_id", "text")
      // repartition (round 6): the per-token md5 simhash UDF ran on the
      // 2-task union (~1.8 s serialized); plan-only spread.
      val aug = spreadByDoc(s, base.unionByName(base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" tailword")).as("text"))))
      Dedup.simhashPairs(aug, col("doc_id"), col("text"), maxHamming = 7)
        .orderBy("id_a", "id_b")
    }),
    "q27_fingerprint" -> ((s, d) => {
      fingerprintfns.register(s)
      docs(s, d).select(col("doc_id"),
          fingerprintfns.rolling_fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),
    "q28_image_validate" -> ((s, d) => {
      // deterministic in-query image fixture (no external data): J7 gates
      val images = graft.fixtures.FixtureGen.imagesDF(s, 200L)
      val idNum = regexp_extract(col("image_id"), "(\\d+)", 1).cast("long")
      images
        .withColumn("psnr", ImageOps.psnrVsSyntheticUdf(col("bytes"), idNum, col("w"), col("h")))
        .withColumn("valid",
          (col("fmt") === "png" && col("psnr") === 999.0) ||
          (col("fmt") === "jpg" && col("psnr") >= 40.0))
        .groupBy("fmt").agg(count(lit(1)).as("n"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
          countDistinct(col("phash")).as("n_phash"))
        .orderBy("fmt")
    }),
    "q29_crawl_order" -> ((s, d) => {
      // the flagship engine as a query: deterministic mini-crawl, dispatch log
      val params = graft.fixtures.FixtureGen.Params(hosts = 2, pagesPerHost = 20)
      val cfg = graft.model.CrawlConfig(
        seedUrls = graft.fixtures.FixtureGen.seeds(params), maxDepth = 5)
      graft.fixtures.FixtureGen.withFixtureEngine(s, params, cfg, "graft-q29") { engine =>
        engine.run()
        engine.orderLog.select("host", "priority", "urlNorm", "disposition")
          .orderBy("host", "priority")
      }
    }),
    "q35_video_frames" -> ((s, d) => {
      // X1 — REAL video decode (Y4M, the codec-free container): synthesize
      // a deterministic multi-frame payload per doc, decode EVERY frame
      // through the real parser ([[graft.functions.Y4m]]), and emit the
      // decoded gray level. Frames are uniform by construction, so min==max
      // across all decoded pixels proves the full plane converted (a
      // non-uniform decode emits -1 and reddens the hash); the oracle
      // recomputes the BT.601 limited-range math in closed-form SQL.
      val framesUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.y4mBytes(docId)
        val parsed = graft.functions.Y4m.parse(bytes).get
        (0 until parsed.frameCount).map { k =>
          val img = graft.functions.Y4m.frame(bytes, parsed, k)
          val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
          val r0 = (px(0) >> 16) & 0xff
          val uniform = px.forall { p =>
            ((p >> 16) & 0xff) == r0 && ((p >> 8) & 0xff) == r0 && (p & 0xff) == r0 }
          (k.toLong, if (uniform) r0.toLong else -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), explode(framesUdf(col("doc_id"))).as("f"))
        .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("gray"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q36_audio_features" -> ((s, d) => {
      // X1 — REAL audio decode (WAV/PCM, the codec-free container):
      // synthesize a deterministic square-wave payload per doc, parse it
      // through the real RIFF walk ([[graft.functions.Wav]] — the fixture
      // plants a LIST chunk between fmt and data, so fixed offsets would
      // misparse), and emit extracted features; the oracle recomputes each
      // in closed-form SQL (±A square wave: peak = RMS = A exactly).
      val featUdf = udf((docId: Long) => {
        val f = graft.functions.Wav.features(
          graft.fixtures.FixtureGen.wavBytes(docId)).get
        (f.sampleRate.toLong, f.nFrames.toLong, f.peak.toLong,
          math.round(f.rms), f.durationMs)
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("sr"), col("f._2").as("n_frames"),
          col("f._3").as("peak"), col("f._4").as("rms"), col("f._5").as("dur_ms"))
        .orderBy("doc_id")
    }),
    "q37_audio_g711" -> ((s, d) => {
      // X1 — REAL compressed-audio decode (ITU-T G.711 μ-law/A-law, WAV
      // format tags 7/6): synthesize a deterministic G.711 payload per doc
      // (alternating sign-flipped code bytes → exact ±v square wave after
      // expansion), decode through the real RIFF walk + integer expansion
      // ([[graft.functions.Wav.ulaw2linear]]/`alaw2linear`, byte-for-byte
      // equal to the JDK's javax.sound converters — WavSpec), and emit the
      // features; the oracle re-runs the SAME ITU integer math in SQL.
      val featUdf = udf((docId: Long) => {
        val f = graft.functions.Wav.features(
          graft.fixtures.FixtureGen.g711Bytes(docId)).get
        (f.audioFormat.toLong, f.nFrames.toLong, f.peak.toLong,
          math.round(f.rms), f.durationMs)
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("codec"), col("f._2").as("n_frames"),
          col("f._3").as("peak"), col("f._4").as("rms"), col("f._5").as("dur_ms"))
        .orderBy("doc_id")
    }),
    "q38_video_mjpeg" -> ((s, d) => {
      // X1 — REAL compressed-video decode (Motion-JPEG in RIFF/AVI):
      // synthesize a deterministic MJPEG payload per doc, walk the real
      // container ([[graft.functions.Avi]]) and decode EVERY frame through
      // the JDK's actual JPEG codec (Huffman+DCT — a genuinely compressed
      // bitstream, unlike Y4M). Frames are uniform gray by construction;
      // `ok` demands every decoded pixel lie within ±4 of the fixture
      // formula — a broken walk, swapped frame order, or mis-decode turns
      // ok false / changes w/h and reddens the hash. The oracle emits the
      // expected rows in closed form.
      val framesUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.aviMjpegBytes(docId)
        val parsed = graft.functions.Avi.parse(bytes).get
        (0 until parsed.frameCount).map { k =>
          val img = graft.functions.Avi.frame(bytes, parsed, k)
          if (img == null) (k.toLong, -1L, -1L, false) // classify, never NPE
          else {
            val expected = (10 + (29 * docId + 13 * k) % 236).toInt
            val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
            val ok = px.forall { p =>
              math.abs(((p >> 16) & 0xff) - expected) <= 4 &&
                math.abs(((p >> 8) & 0xff) - expected) <= 4 &&
                math.abs((p & 0xff) - expected) <= 4
            }
            (k.toLong, img.getWidth.toLong, img.getHeight.toLong, ok)
          }
        }
      })
      docsSpread(s, d).select(col("doc_id"), explode(framesUdf(col("doc_id"))).as("f"))
        .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("w"),
          col("f._3").as("h"), col("f._4").as("ok"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q39_audio_adpcm" -> ((s, d) => {
      // X1 — REAL compressed-audio decode #2 (IMA/DVI ADPCM, WAV format
      // tag 0x11 — a STATEFUL adaptive codec at 4 bits/sample, unlike the
      // per-byte G.711 expansion): synthesize a deterministic two-block
      // ADPCM payload per doc ([[graft.fixtures.FixtureGen.adpcmBytes]]),
      // decode through the real RIFF walk + block-header reseed + step/
      // index adaptation ([[graft.functions.Wav.adpcmStep]]), and emit
      // exact-integer features (peak + sum of squares — no float RMS, so
      // the gate is bit-exact); the oracle regenerates the closed-form
      // signal per pattern and aggregates it in SQL. A decoder that gets
      // any clamp, table entry, nibble order, or block reseed wrong
      // reddens the hash.
      val featUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.adpcmBytes(docId)
        val f = graft.functions.Wav.features(bytes).get
        val ss = graft.functions.Wav.samples(bytes).get
          .foldLeft(0L)((a, v) => a + v.toLong * v)
        (f.nFrames.toLong, f.peak.toLong, ss, f.durationMs)
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("n_frames"), col("f._2").as("peak"),
          col("f._3").as("sumsq"), col("f._4").as("dur_ms"))
        .orderBy("doc_id")
    }),
    "q40_audio_flac" -> ((s, d) => {
      // X1 — REAL compressed-audio decode #3 (FLAC — a true ENTROPY-CODED
      // bitstream: Rice/Golomb residuals, linear prediction, per-frame
      // CRC-8/CRC-16, MSB-first bit packing; unlike G.711's table
      // expansion or ADPCM's nibble walk): synthesize a deterministic
      // two-frame FLAC stream per doc ([[graft.fixtures.FixtureGen
      // .flacBytes]] — constant / fixed-ramp / LPC / stereo mid-side
      // patterns by doc_id%4), decode through the magic-sniffed
      // [[graft.functions.AudioContainers]] dispatch, and emit
      // exact-integer features; the oracle regenerates the closed-form
      // signal per pattern and aggregates it in SQL. A decoder that gets
      // any Rice parameter, zig-zag fold, predictor coefficient, CRC, or
      // mid/side reconstruction wrong reddens the hash.
      val featUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.flacBytes(docId)
        val f = graft.functions.AudioContainers.features(bytes).get
        val ss = graft.functions.AudioContainers.samples(bytes).get
          .foldLeft(0L)((a, v) => a + v.toLong * v)
        (f.channels.toLong, f.sampleRate.toLong, f.nFrames.toLong,
          f.peak.toLong, ss)
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("ch"), col("f._2").as("sr"),
          col("f._3").as("n_frames"), col("f._4").as("peak"),
          col("f._5").as("sumsq"))
        .orderBy("doc_id")
    }),
    "q41_video_gif" -> ((s, d) => {
      // X1 — REAL compressed-video decode #2 (animated GIF — LZW + palette
      // + patch/disposal compositing, the most common animation a crawl
      // fetches): synthesize a deterministic multi-frame GIF per doc,
      // sample EVERY frame through the magic-sniffed
      // [[graft.functions.VideoContainers]] dispatch (the same distributed
      // operator path as Y4M/AVI), and emit the decoded gray. GIF is
      // lossless for in-palette colors, so gray must EQUAL the fixture
      // formula exactly (a non-uniform or off-by-one decode emits -1 and
      // reddens the hash); the oracle emits the rows in closed form.
      val framesUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.gifBytes(docId)
        graft.functions.VideoContainers
          .sampleFramesIndexed(bytes, Int.MaxValue).map { case (k, img) =>
            val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
            val r0 = (px(0) >> 16) & 0xff
            val uniform = px.forall { p =>
              ((p >> 16) & 0xff) == r0 && ((p >> 8) & 0xff) == r0 && (p & 0xff) == r0 }
            (k.toLong, img.getWidth.toLong, img.getHeight.toLong,
              if (uniform) r0.toLong else -1L)
          }
      })
      docsSpread(s, d).select(col("doc_id"), explode(framesUdf(col("doc_id"))).as("f"))
        .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("w"),
          col("f._3").as("h"), col("f._4").as("gray"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q42_video_apng" -> ((s, d) => {
      // X1 — REAL compressed-video decode #3 (animated PNG: the JDK has
      // NO APNG support — [[graft.functions.Apng]] walks the acTL/fcTL/
      // fdAT chunks with CRC-32 verification, SYNTHESIZES a standalone
      // PNG per frame (fdAT re-wrapped as IDAT), and composites patches
      // with blend/dispose semantics). The fixture alternates BOTH spec
      // stream shapes (default-image-as-frame-0 / default-image-excluded)
      // by doc parity; PNG is lossless, so gray must EQUAL the formula
      // exactly. Runs through the magic-sniffed [[graft.functions
      // .VideoContainers]] dispatch like every other video payload.
      val framesUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.apngBytes(docId)
        graft.functions.VideoContainers
          .sampleFramesIndexed(bytes, Int.MaxValue).map { case (k, img) =>
            val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
            val r0 = (px(0) >> 16) & 0xff
            val uniform = px.forall { p =>
              ((p >> 16) & 0xff) == r0 && ((p >> 8) & 0xff) == r0 && (p & 0xff) == r0 }
            (k.toLong, img.getWidth.toLong, img.getHeight.toLong,
              if (uniform) r0.toLong else -1L)
          }
      })
      docsSpread(s, d).select(col("doc_id"), explode(framesUdf(col("doc_id"))).as("f"))
        .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("w"),
          col("f._3").as("h"), col("f._4").as("gray"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q43_video_rle" -> ((s, d) => {
      // X1 — REAL compressed-video decode #4, and the first INTER-FRAME
      // codec: Microsoft RLE8 in RIFF/AVI ([[graft.functions.Rle8]]).
      // Frames after the keyframe are DELTA chunks — they paint only an
      // 8×8 patch and skip the rest, so the sampled background is correct
      // ONLY if the decoder composited the previous frames (a
      // standalone-frame decode shows black there and emits -1). The check
      // is exact (identity palette, RLE is lossless); the oracle emits the
      // two-region closed form per frame. Runs through the magic-sniffed
      // [[graft.functions.VideoContainers]] dispatch like every other
      // video payload.
      val framesUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.aviRleBytes(docId)
        val bg = (20 + (43 * docId) % 225).toInt
        graft.functions.VideoContainers
          .sampleFramesIndexed(bytes, Int.MaxValue).map { case (k, img) =>
            val w = img.getWidth; val h = img.getHeight
            val pg = if (k == 0) bg else (20 + (43 * docId + 19 * k) % 225).toInt
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val ok = (0 until h).forall { y =>
              (0 until w).forall { x =>
                val e = if (k >= 1 && x >= 4 && x < 12 && y >= 4 && y < 12) pg else bg
                val p = px(y * w + x)
                ((p >> 16) & 0xff) == e && ((p >> 8) & 0xff) == e && (p & 0xff) == e
              }
            }
            (k.toLong, w.toLong, h.toLong,
              if (ok) bg.toLong else -1L, if (ok) pg.toLong else -1L)
          }
      })
      docsSpread(s, d).select(col("doc_id"), explode(framesUdf(col("doc_id"))).as("f"))
        .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("w"),
          col("f._3").as("h"), col("f._4").as("bg_gray"), col("f._5").as("patch_gray"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q44_audio_msadpcm" -> ((s, d) => {
      // X1 — REAL compressed-audio decode #4 (Microsoft ADPCM, WAV format
      // tag 0x02 — a 2-tap LPC predictor with per-block coefficient-pair
      // selection from the file-carried table plus nibble-driven delta
      // adaptation; structurally different machinery from IMA's step-table
      // walk): synthesize a deterministic two-block payload per doc
      // ([[graft.fixtures.FixtureGen.msAdpcmBytes]] — header-order / both
      // clamp bounds / stereo nibble-alternation patterns by doc_id%3),
      // decode through the real RIFF walk + [[graft.functions.Wav
      // .msAdpcmStep]], and emit exact-integer features; the oracle
      // regenerates the closed-form signal per pattern in SQL. A decoder
      // that gets the field-major header layout, frame order (sample2
      // FIRST), coefficient table, signed nibble, clamp, or high-first
      // nibble order wrong reddens the hash.
      val featUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.msAdpcmBytes(docId)
        val f = graft.functions.Wav.features(bytes).get
        val ss = graft.functions.Wav.samples(bytes).get
          .foldLeft(0L)((a, v) => a + v.toLong * v)
        (f.channels.toLong, f.nFrames.toLong, f.peak.toLong, ss, f.durationMs)
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("ch"), col("f._2").as("n_frames"),
          col("f._3").as("peak"), col("f._4").as("sumsq"), col("f._5").as("dur_ms"))
        .orderBy("doc_id")
    }),
    "q45_image_qoi" -> ((s, d) => {
      // X1 — REAL image decode the JDK does NOT ship (QOI — the published
      // one-page LZ-style format): synthesize a deterministic QOI payload
      // per doc ([[graft.fixtures.FixtureGen.qoiBytes]] — RUN/DIFF/LUMA
      // rows, RGB and RGBA headers by doc parity), decode through the
      // magic-sniffed [[graft.functions.ImageOps.decode]] dispatch (the
      // SAME path phash/PSNR/resize/J7 ride), and emit a position-weighted
      // exact checksum. QOI is lossless, so the decoded gray must EQUAL
      // the fixture formula; non-gray or mis-positioned pixels emit -1
      // and redden the hash. The oracle regenerates the formula in SQL.
      val featUdf = udf((docId: Long) => {
        val img = graft.functions.ImageOps.decode(
          graft.fixtures.FixtureGen.qoiBytes(docId))
        if (img == null) (-1L, -1L, -1L, -1L)
        else {
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var checksum = 0L; var peak = 0L; var gray = true
          var i = 0
          while (i < px.length) {
            val r = (px(i) >> 16) & 0xff
            if (((px(i) >> 8) & 0xff) != r || (px(i) & 0xff) != r) gray = false
            checksum += r.toLong * (1 + (i % w) + w.toLong * (i / w))
            if (r > peak) peak = r
            i += 1
          }
          if (gray) (w.toLong, h.toLong, checksum, peak) else (-1L, -1L, -1L, -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("w"), col("f._2").as("h"),
          col("f._3").as("checksum"), col("f._4").as("peak"))
        .orderBy("doc_id")
    }),
    "q46_audio_bigendian" -> ((s, d) => {
      // X1 — REAL decode for the two BIG-endian audio containers: AIFF
      // (even docs — 16-bit BE PCM whose sample rate rides the 80-bit
      // IEEE extended-precision COMM field, the format's genuinely tricky
      // part: a wrong bias/hidden-bit/signed-mantissa assumption shifts
      // the rate and reddens dur_ms) and Sun AU (odd docs — variable data
      // offset + G.711 μ/A-law reuse). Decode through the magic-sniffed
      // [[graft.functions.AudioContainers]] dispatch; the emitted codec
      // tag (1 PCM / 7 μ-law / 6 A-law) proves WHICH decoder ran. The
      // oracle recomputes the ITU expansion in SQL exactly as q37.
      val featUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.bigEndianAudioBytes(docId)
        val f = graft.functions.AudioContainers.features(bytes).get
        val ss = graft.functions.AudioContainers.samples(bytes).get
          .foldLeft(0L)((a, v) => a + v.toLong * v)
        (f.audioFormat.toLong, f.sampleRate.toLong, f.nFrames.toLong,
          f.peak.toLong, ss, f.durationMs)
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("codec"), col("f._2").as("sr"),
          col("f._3").as("n_frames"), col("f._4").as("peak"),
          col("f._5").as("sumsq"), col("f._6").as("dur_ms"))
        .orderBy("doc_id")
    }),
    "q47_video_dib" -> ((s, d) => {
      // X1 — REAL uncompressed-DIB video in RIFF/AVI (BI_RGB — the raw
      // raster layout every Windows-lineage tool emits): 24-bit BGR and
      // 8-bit paletted frames, rows padded to 4-byte stride, BOTTOM-UP
      // unless the strf carries a negative biHeight (the top-down
      // variant — doc%3==2 puts it on the wire every round). The fixture
      // gradient keys gray to (x, y), so a stride miscount, a BGR/RGB
      // swap, or a row-order mistake shifts the position-weighted
      // checksum and reddens the hash. Runs through the magic-sniffed
      // [[graft.functions.VideoContainers]] dispatch like every video.
      val framesUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.aviDibBytes(docId)
        graft.functions.VideoContainers
          .sampleFramesIndexed(bytes, Int.MaxValue).map { case (k, img) =>
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var checksum = 0L; var peak = 0L; var gray = true
            var i = 0
            while (i < px.length) {
              val r = (px(i) >> 16) & 0xff
              if (((px(i) >> 8) & 0xff) != r || (px(i) & 0xff) != r) gray = false
              checksum += r.toLong * (1 + (i % w) + w.toLong * (i / w))
              if (r > peak) peak = r
              i += 1
            }
            if (gray) (k.toLong, w.toLong, h.toLong, checksum, peak)
            else (k.toLong, -1L, -1L, -1L, -1L)
          }
      })
      docsSpread(s, d).select(col("doc_id"), explode(framesUdf(col("doc_id"))).as("f"))
        .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("w"),
          col("f._3").as("h"), col("f._4").as("checksum"), col("f._5").as("peak"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q48_image_webp" -> ((s, d) => {
      // X1 — REAL decode for WebP lossless (VP8L), the deepest
      // entropy-coded image bitstream in the module (canonical prefix
      // codes via code-length codes, LZ77 + the 120-entry neighbor map,
      // color cache, and four spatial transforms): synthesize a
      // deterministic 21×13 VP8L payload per doc
      // ([[graft.fixtures.FixtureGen.webpBytes]] — doc_id%6 cycles plain /
      // subtract-green+cache / prediction / cross-color / palette / the
      // full transform stack), decode through the magic-sniffed
      // [[graft.functions.ImageOps.decode]] dispatch (the SAME path
      // phash/PSNR/resize/J7 ride), and emit a position-weighted exact
      // checksum. VP8L is lossless through every transform, so the
      // decoded gray must EQUAL the fixture formula; any prefix-code,
      // LZ77-distance, or inverse-transform slip reddens the hash. The
      // oracle regenerates the formula in SQL.
      val featUdf = udf((docId: Long) => {
        val img = graft.functions.ImageOps.decode(
          graft.fixtures.FixtureGen.webpBytes(docId))
        if (img == null) (-1L, -1L, -1L, -1L)
        else {
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var checksum = 0L; var peak = 0L; var gray = true
          var i = 0
          while (i < px.length) {
            val r = (px(i) >> 16) & 0xff
            if (((px(i) >> 8) & 0xff) != r || (px(i) & 0xff) != r) gray = false
            checksum += r.toLong * (1 + (i % w) + w.toLong * (i / w))
            if (r > peak) peak = r
            i += 1
          }
          if (gray) (w.toLong, h.toLong, checksum, peak) else (-1L, -1L, -1L, -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("w"), col("f._2").as("h"),
          col("f._3").as("checksum"), col("f._4").as("peak"))
        .orderBy("doc_id")
    }),
    "q49_video_animwebp" -> ((s, d) => {
      // X1 — REAL compressed-video decode #5, INTER-FRAME like q43 but on
      // the WebP extended container ([[graft.functions.AnimWebp]]:
      // VP8X/ANIM/ANMF walk, per-frame VP8L bitstreams decoded by the q48
      // codec, blend/dispose compositing). Frames after the first paint
      // ONLY an 8×6 patch at (6,4) — the sampled background is correct
      // ONLY if the decoder composited the prior frames (a standalone
      // decode shows transparent there and emits -1). VP8L is lossless,
      // so the check is exact; the oracle emits the two-region closed
      // form per frame. Runs through the magic-sniffed
      // [[graft.functions.VideoContainers]] dispatch like every other
      // video payload.
      val framesUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.animWebpBytes(docId)
        graft.functions.VideoContainers
          .sampleFramesIndexed(bytes, Int.MaxValue).map { case (k, img) =>
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var bg = -1L; var patch = -1L; var ok = true
            var i = 0
            while (ok && i < px.length) {
              val x = i % w; val y = i / w
              val p = px(i)
              val r = (p >> 16) & 0xff
              if ((p >>> 24) != 0xff || ((p >> 8) & 0xff) != r || (p & 0xff) != r)
                ok = false
              else if (x >= 6 && x < 14 && y >= 4 && y < 10) {
                if (patch < 0) patch = r else if (patch != r) ok = false
              } else if (bg < 0) bg = r else if (bg != r) ok = false
              i += 1
            }
            if (ok) (k.toLong, w.toLong, h.toLong, bg, patch)
            else (k.toLong, w.toLong, h.toLong, -1L, -1L)
          }
      })
      docsSpread(s, d).select(col("doc_id"), explode(framesUdf(col("doc_id"))).as("f"))
        .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("w"),
          col("f._3").as("h"), col("f._4").as("bg_gray"), col("f._5").as("patch_gray"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q50_image_ico" -> ((s, d) => {
      // X1 — REAL decode for ICO favicons ([[graft.functions.Ico]]): the
      // web's most-fetched image container and a format the JDK cannot
      // read. The fixture is a 2-member directory (a low-depth decoy the
      // best-member selection must skip, then the real 18×11 image whose
      // DIB depth cycles 1/4/8/24/32-bpp + an embedded-PNG member by
      // doc_id%6); decode rides the magic-sniffed
      // [[graft.functions.ImageOps.decode]] dispatch (the SAME path
      // phash/PSNR/resize/J7 ride) and emits a position-weighted exact
      // checksum + member count. ICO DIBs are exact and the quadrant
      // fixture varies along both axes, so a stride, row-order, palette,
      // nibble-packing, or member-selection slip reddens the hash; the
      // oracle regenerates the quadrant closed form in SQL.
      val featUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.icoBytes(docId)
        val img = graft.functions.ImageOps.decode(bytes)
        val n = graft.functions.Ico.imageCount(bytes).toLong
        if (img == null) (-1L, -1L, -1L, -1L, n)
        else {
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var checksum = 0L; var peak = 0L; var gray = true
          var i = 0
          while (i < px.length) {
            val r = (px(i) >> 16) & 0xff
            if ((px(i) >>> 24) != 0xff ||
                ((px(i) >> 8) & 0xff) != r || (px(i) & 0xff) != r) gray = false
            checksum += r.toLong * (1 + (i % w) + w.toLong * (i / w))
            if (r > peak) peak = r
            i += 1
          }
          if (gray) (w.toLong, h.toLong, checksum, peak, n)
          else (-1L, -1L, -1L, -1L, n)
        }
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("w"), col("f._2").as("h"),
          col("f._3").as("checksum"), col("f._4").as("peak"),
          col("f._5").as("n_members"))
        .orderBy("doc_id")
    }),
    "q51_image_tga" -> ((s, d) => {
      // X1 — REAL decode for TGA textures ([[graft.functions.Tga]]), the
      // asset format game/3D crawls fetch and the JDK cannot read. TGA
      // has NO magic bytes, so this rides the REGISTRY dispatch by
      // declared fmt (`DecoderRegistry.get("tga")`) — the path a crawl
      // takes when content bytes carry no signature — not the magic
      // sniff. The fixture cycles truecolor 24/32, RLE, palette raw/RLE
      // (one variant right-to-left), and grayscale, alternating top-down
      // / bottom-up origins; decode is exact, so an origin-flip, RLE
      // packet, or palette slip reddens the position-weighted checksum
      // the oracle regenerates from the quadrant closed form.
      val featUdf = udf((docId: Long) => {
        val img = graft.sources.DecoderRegistry.get("tga")
          .decode(graft.fixtures.FixtureGen.tgaBytes(docId))
        if (img == null) (-1L, -1L, -1L, -1L)
        else {
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var checksum = 0L; var peak = 0L; var gray = true
          var i = 0
          while (i < px.length) {
            val r = (px(i) >> 16) & 0xff
            if ((px(i) >>> 24) != 0xff ||
                ((px(i) >> 8) & 0xff) != r || (px(i) & 0xff) != r) gray = false
            checksum += r.toLong * (1 + (i % w) + w.toLong * (i / w))
            if (r > peak) peak = r
            i += 1
          }
          if (gray) (w.toLong, h.toLong, checksum, peak) else (-1L, -1L, -1L, -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), featUdf(col("doc_id")).as("f"))
        .select(col("doc_id"), col("f._1").as("w"), col("f._2").as("h"),
          col("f._3").as("checksum"), col("f._4").as("peak"))
        .orderBy("doc_id")
    }),
    "q52_audio_mp3meta" -> ((s, d) => {
      // X1 — MPEG audio (MP3) frame-header METADATA
      // ([[graft.functions.Mpeg]]): the ffprobe-shaped operation a
      // training pipeline runs at 100 TB — duration/bitrate/rate/channel
      // bucketing WITHOUT decoding samples (sample decode needs a codec
      // and stays honestly stubbed). The walk chains real frame headers
      // sync-to-sync, skips leading ID3v2 tags (every fourth doc wears
      // one), and classifies junk; the fixture cycles the full MPEG1-L3
      // bitrate table, all three sample rates, and both channel modes,
      // each emitted field pinned by the closed-form oracle.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Mpeg.audioMeta(graft.fixtures.FixtureGen.mp3Bytes(docId)) match {
          case Some(m) => (m.sampleRate.toLong, m.channels.toLong,
            m.frames.toLong, m.bitrateKbps.toLong, m.durationMs)
          case None => (-1L, -1L, -1L, -1L, -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("sample_rate"),
          col("m._2").as("channels"), col("m._3").as("n_frames"),
          col("m._4").as("bitrate_kbps"), col("m._5").as("duration_ms"))
        .orderBy("doc_id")
    }),
    "q53_video_mp4meta" -> ((s, d) => {
      // X1 — ISO-BMFF (MP4) box-walk METADATA ([[graft.functions.Mp4]]):
      // brand, movie duration, per-track codec fourcc, video dims, audio
      // rate/channels, sample counts — the ffprobe-shaped operation for
      // the web's dominant video container, WITHOUT decoding samples
      // (h264/hevc/aac decode needs codecs and stays honestly stubbed).
      // The fixture cycles codecs/brands/dims and rotates v1 FullBoxes,
      // 64-bit largesize mdat, and a moov uuid box — structure variants
      // that must not move any output; every field is pinned by the
      // closed-form oracle.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Mp4.videoMeta(graft.fixtures.FixtureGen.mp4Bytes(docId)) match {
          case Some(m) =>
            val v = m.video.getOrElse(graft.functions.Mp4.Track("", "", 0, 0, 0, 0, -1L, -1L))
            val a = m.audio.getOrElse(graft.functions.Mp4.Track("", "", 0, 0, 0, 0, -1L, -1L))
            (m.brand, m.durationMs, v.codec, v.width.toLong, v.height.toLong,
              v.nSamples, a.codec, a.sampleRate.toLong, a.channels.toLong)
          case None => ("", -1L, "", -1L, -1L, -1L, "", -1L, -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("brand"),
          col("m._2").as("duration_ms"), col("m._3").as("video_codec"),
          col("m._4").as("w"), col("m._5").as("h"),
          col("m._6").as("n_video_samples"), col("m._7").as("audio_codec"),
          col("m._8").as("audio_rate"), col("m._9").as("audio_channels"))
        .orderBy("doc_id")
    }),
    "q54_image_exif" -> ((s, d) => {
      // X1 — JPEG marker walk + EXIF metadata ([[graft.functions.Jpeg]]):
      // SOF dims off the real JDK-encoded marker stream, orientation /
      // camera / timestamp / ISO / Exif dims from the TIFF IFDs (both
      // byte orders), and the has_gps PII-scrub flag a pipeline checks
      // before publishing crawled images. Every field is pinned by the
      // closed-form oracle; dims come from the actual SOF, not the spec.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Jpeg.exifMeta(graft.fixtures.FixtureGen.jpegExifBytes(docId)) match {
          case Some(m) => (m.width.toLong, m.height.toLong, m.orientation.toLong,
            m.make, m.model, m.dateTime, m.exifWidth, m.exifHeight, m.iso, m.hasGps)
          case None => (-1L, -1L, -1L, "", "", "", -1L, -1L, -1L, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("w"), col("m._2").as("h"),
          col("m._3").as("orientation"), col("m._4").as("make"),
          col("m._5").as("model"), col("m._6").as("taken_at"),
          col("m._7").as("exif_w"), col("m._8").as("exif_h"),
          col("m._9").as("iso"), col("m._10").as("has_gps"))
        .orderBy("doc_id")
    }),
    "q55_audio_oggmeta" -> ((s, d) => {
      // X1 — Ogg container metadata ([[graft.functions.Ogg]]): codec /
      // channels / rate / Opus pre-skip / duration / page count via the
      // RFC 3533 page walk with REAL per-page CRC verification and the
      // published Vorbis-I and OpusHead identification headers — the
      // streaming-audio analog of q53's MP4 walk. Sample decode
      // (MDCT/CELT/SILK) needs codecs and stays honestly stubbed.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Ogg.audioMeta(graft.fixtures.FixtureGen.oggBytes(docId)) match {
          case Some(m) => (m.codec, m.channels.toLong, m.sampleRate.toLong,
            m.preSkipSamples.toLong, m.durationMs, m.pages.toLong)
          case None => ("", -1L, -1L, -1L, -1L, -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("codec"),
          col("m._2").as("channels"), col("m._3").as("sample_rate"),
          col("m._4").as("pre_skip"), col("m._5").as("duration_ms"),
          col("m._6").as("n_pages"))
        .orderBy("doc_id")
    }),
    "q56_video_mkvmeta" -> ((s, d) => {
      // X1 — Matroska/WebM EBML metadata ([[graft.functions.Mkv]]):
      // doc type, duration (TimestampScale × Duration float), per-track
      // codec IDs, video dims, audio rate/channels — the royalty-free
      // half of modern web video beside q53's MP4 walk, including the
      // live-muxed unknown-Segment-size shape. Block decode (VP8/VP9/
      // AV1, Opus/Vorbis) needs codecs and stays honestly stubbed.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Mkv.videoMeta(graft.fixtures.FixtureGen.mkvBytes(docId)) match {
          case Some(m) => (m.docType, m.durationMs, m.videoCodec,
            m.width.toLong, m.height.toLong, m.audioCodec,
            m.sampleRate.toLong, m.channels.toLong)
          case None => ("", -1L, "", -1L, -1L, "", -1L, -1L)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("doc_type"),
          col("m._2").as("duration_ms"), col("m._3").as("video_codec"),
          col("m._4").as("w"), col("m._5").as("h"),
          col("m._6").as("audio_codec"), col("m._7").as("audio_rate"),
          col("m._8").as("audio_channels"))
        .orderBy("doc_id")
    }),
    "q57_media_triage" -> ((s, d) => {
      // X1 — single-pass media TRIAGE ([[graft.functions.MediaMeta]]):
      // the one call a pipeline runs on every fetched payload — sniff the
      // container from CONTENT (never a trusted column), route to the
      // walker that owns it, normalize to one (kind, container, codec,
      // dims, duration, rate, channels) record. Each doc cycles through
      // 12 container families by doc_id%12 with the payload keyed by the
      // QUOTIENT, so every family sees every residue class; family 11 is
      // TGA, which is signature-less by design — content triage honestly
      // reports it unknown (reachable only by declared fmt, see q51).
      val triageUdf = udf((docId: Long) => {
        val q = docId / 12
        val bytes = (docId % 12) match {
          case 0 => graft.fixtures.FixtureGen.jpegExifBytes(q)
          case 1 => graft.fixtures.FixtureGen.mp4Bytes(q)
          case 2 => graft.fixtures.FixtureGen.mkvBytes(q)
          case 3 => graft.fixtures.FixtureGen.oggBytes(q)
          case 4 => graft.fixtures.FixtureGen.wavBytes(q)
          case 5 => graft.fixtures.FixtureGen.mp3Bytes(q)
          case 6 => graft.fixtures.FixtureGen.y4mBytes(q)
          case 7 => graft.fixtures.FixtureGen.gifBytes(q)
          case 8 => graft.fixtures.FixtureGen.qoiBytes(q)
          case 9 => graft.fixtures.FixtureGen.webpBytes(q)
          case 10 => graft.fixtures.FixtureGen.icoBytes(q)
          case _ => graft.fixtures.FixtureGen.tgaBytes(q)
        }
        val m = graft.functions.MediaMeta.describe(bytes)
        (m.kind, m.container, m.codec, m.width.toLong, m.height.toLong,
          m.durationMs, m.sampleRate.toLong, m.channels.toLong)
      })
      docsSpread(s, d).select(col("doc_id"), triageUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("kind"),
          col("m._2").as("container"), col("m._3").as("codec"),
          col("m._4").as("w"), col("m._5").as("h"),
          col("m._6").as("duration_ms"), col("m._7").as("sample_rate"),
          col("m._8").as("channels"))
        .orderBy("doc_id")
    }),
    "q58_image_heif" -> ((s, d) => {
      // X1 — HEIF/AVIF still-image metadata ([[graft.functions.Heif]]):
      // brand, primary-item codec, ispe dims resolved through the ipma
      // item-to-property associations, irot rotation, item census, and
      // the has_exif PII-scrub flag — the modern-photo half of the image
      // story (every iPhone still, every AV1 image). ISO-BMFF like q53
      // but an ITEM grammar, not a movie: no tracks, no duration. Still
      // decode (av01/hvc1) needs codecs and stays honestly stubbed.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Heif.imageMeta(graft.fixtures.FixtureGen.heifBytes(docId)) match {
          case Some(m) => (m.brand, m.codec, m.width.toLong, m.height.toLong,
            m.rotationDeg.toLong, m.nItems.toLong, m.hasExif)
          case None => ("", "", -1L, -1L, -1L, -1L, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("brand"), col("m._2").as("codec"),
          col("m._3").as("w"), col("m._4").as("h"),
          col("m._5").as("rotation"), col("m._6").as("n_items"),
          col("m._7").as("has_exif"))
        .orderBy("doc_id")
    }),
    "q59_image_svg" -> ((s, d) => {
      // X1 — SVG metadata ([[graft.functions.Svg]]): resolved pixel dims
      // (CSS absolute units at 96 dpi, viewBox fallback), element census,
      // and the two republish-scrub signals — has_script (SVG carries
      // executable script: the stored-XSS vector in uploaded avatars)
      // and has_external_ref (rendering phones home: tracking pixels).
      // XXE posture matches the sitemap parser: entities reject outright.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Svg.imageMeta(graft.fixtures.FixtureGen.svgBytes(docId)) match {
          case Some(m) => (m.width.toLong, m.height.toLong,
            m.nElements.toLong, m.hasScript, m.hasExternalRef)
          case None => (-1L, -1L, -1L, false, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("w"), col("m._2").as("h"),
          col("m._3").as("n_elements"), col("m._4").as("has_script"),
          col("m._5").as("has_external_ref"))
        .orderBy("doc_id")
    }),
    "q60_doc_pdf" -> ((s, d) => {
      // X1 — PDF document metadata ([[graft.functions.Pdf]]): version,
      // page count, the encryption flag, and the has_js /
      // has_attachments republish-scrub signals, via the REAL xref
      // machinery of ISO 32000-1 — classic tables, incremental /Prev
      // chains (newest entry wins), cross-reference streams
      // (FlateDecode + PNG predictors), and compressed-object streams.
      // Content decode (text/fonts/images) needs a renderer and stays
      // honestly out of scope. xref_kind/incremental prove WHICH
      // parser path ran per doc.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Pdf.docMeta(graft.fixtures.FixtureGen.pdfBytes(docId)) match {
          case Some(m) => (m.version, m.nPages, m.encrypted, m.hasJs,
            m.hasAttachments, m.xrefKind, m.incremental)
          case None => ("", -1L, false, false, false, "", false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("version"),
          col("m._2").as("n_pages"), col("m._3").as("encrypted"),
          col("m._4").as("has_js"), col("m._5").as("has_attachments"),
          col("m._6").as("xref_kind"), col("m._7").as("incremental"))
        .orderBy("doc_id")
    }),
    "q61_archive_warc" -> ((s, d) => {
      // X1/S10 — WARC (ISO 28500) archive walk ([[graft.functions.Warc]]):
      // the wire format a web-scale crawl ingests and emits (Common
      // Crawl). Full record grammar (version line, folded named fields,
      // Content-Length blocks, CRLF CRLF terminators), per-record gzip
      // members split + CRC-verified by hand (GZIPInputStream hides the
      // boundaries), HTTP response blocks, and WARC-Payload-Digest
      // sha1/base32 verification — digest_ok=false on the fixture's
      // corrupted-digest docs proves the check runs, not just parses.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Warc.archiveMeta(
            graft.fixtures.FixtureGen.warcBytes(docId)) match {
          case Some(m) => (m.version, m.gzipped, m.nRecords.toLong,
            m.httpStatus.toLong, m.contentType, m.payloadLen,
            m.digestOk, m.hasRevisit)
          case None => ("", false, -1L, -1L, "", -1L, false, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("version"),
          col("m._2").as("gzipped"), col("m._3").as("n_records"),
          col("m._4").as("http_status"), col("m._5").as("content_type"),
          col("m._6").as("payload_len"), col("m._7").as("digest_ok"),
          col("m._8").as("has_revisit"))
        .orderBy("doc_id")
    }),
    "q62_doc_docx" -> ((s, d) => {
      // X1 — DOCX/OOXML document walk ([[graft.functions.Zip]]): the real
      // ZIP machinery (EOCD scan, central directory, local-header
      // indirection, STORED + DEFLATE with per-entry CRC32, ZIP64
      // EOCD64/locator/0x0001-extra shapes), then WordprocessingML
      // metadata a training pipeline needs pre-ingest: paragraph/word
      // counts from w:p/w:t, title/creator from docProps/core.xml, and
      // the has_macros (vbaProject.bin) / has_external_ref
      // (TargetMode="External": remote-template injection) scrub
      // signals. doc_method + zip64 prove WHICH container paths ran.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Zip.docxMeta(
            graft.fixtures.FixtureGen.docxBytes(docId)) match {
          case Some(m) => (m.nEntries.toLong, m.nParagraphs.toLong,
            m.nWords.toLong, m.title, m.creator, m.hasMacros,
            m.hasExternalRef, m.docMethod, m.zip64)
          case None => (-1L, -1L, -1L, "", "", false, false, "", false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("n_entries"),
          col("m._2").as("n_paragraphs"), col("m._3").as("n_words"),
          col("m._4").as("title"), col("m._5").as("creator"),
          col("m._6").as("has_macros"), col("m._7").as("has_external_ref"),
          col("m._8").as("doc_method"), col("m._9").as("zip64"))
        .orderBy("doc_id")
    }),
    "q63_doc_triage" -> ((s, d) => {
      // X1 — the content-sniffed triage extended to the DOCUMENT family:
      // ONE describe() call routes pdf/warc/docx payloads as
      // kind=document by magic, and the wav doc in the same cycle must
      // still triage as audio — proving the document branches shadow
      // nothing ([[graft.functions.MediaMeta]]).
      val metaUdf = udf((docId: Long) => {
        val bytes = (docId % 4) match {
          case 0 => graft.fixtures.FixtureGen.pdfBytes(docId)
          case 1 => graft.fixtures.FixtureGen.warcBytes(docId)
          case 2 => graft.fixtures.FixtureGen.docxBytes(docId)
          case _ => graft.fixtures.FixtureGen.wavBytes(docId)
        }
        val m = graft.functions.MediaMeta.describe(bytes)
        (m.kind, m.container)
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("kind"),
          col("m._2").as("container"))
        .orderBy("doc_id")
    }),
    "q64_archive_cdx" -> ((s, d) => {
      // S12/X1 — CDX indexing over WARC archives
      // ([[graft.functions.Warc.cdxLines]], [[graft.functions.Surt]]):
      // the SURT search key and 14-digit timestamp every web archive's
      // index speaks, plus REPLAYED offsets — replay_ok re-reads each
      // line's [offset, offset+length) slice (a gzip member for
      // compressed archives, raw record bytes for plain), re-parses it,
      // and requires the same response URI back. An index whose offsets
      // don't replay is worse than none.
      val metaUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.warcBytes(docId)
        graft.functions.Warc.cdxLines(f"doc-$docId%05d.warc", bytes) match {
          case Some(lines) if lines.nonEmpty =>
            val l = lines.head
            val replayOk = lines.forall { ln =>
              ln.offset >= 0 && ln.length > 0 &&
              ln.offset + ln.length <= bytes.length && {
                val slice = java.util.Arrays.copyOfRange(
                  bytes, ln.offset.toInt, (ln.offset + ln.length).toInt)
                graft.functions.Warc.parseAll(slice).exists(_.exists(r =>
                  r.warcType == "response" && r.targetUri == ln.url))
              }
            }
            (l.surtKey, l.ts, l.mime, l.status.toLong,
              lines.size.toLong, replayOk)
          case _ => ("", "", "", -1L, -1L, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("surt"), col("m._2").as("ts"),
          col("m._3").as("mime"), col("m._4").as("status"),
          col("m._5").as("n_lines"), col("m._6").as("replay_ok"))
        .orderBy("doc_id")
    }),
    "q65_archive_wet" -> ((s, d) => {
      // X1/S10 — WET round-trip over the REAL documents text: each
      // row's text is serialized as a WARC `conversion` record (gzipped
      // member-per-record on even ids, plain on odd — both read paths),
      // then extracted back through [[graft.functions.Warc.wetTexts]],
      // the Common Crawl text-corpus ingest path. text_len crosses
      // engines (DuckDB len() over the same parquet text must equal the
      // length Spark measured AFTER the WARC round-trip), and
      // roundtrip_ok requires byte-exact text recovery — Content-Length
      // is bytes, the text is characters, and the grammar walk must
      // never lose or gain either.
      val wetUdf = udf((docId: Long, text: String) => {
        import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
        val t = if (text == null) "" else text
        val uri = s"https://wet.test/doc/$docId"
        val date = f"2026-08-19T00:00:${docId % 60}%02dZ"
        val bytes = graft.functions.Warc.encode("1.1", Vector(
          (graft.functions.Warc.RecordSpec("warcinfo", None,
            "software: graft\r\n".getBytes(US_ASCII),
            "application/warc-fields"), s"urn:uuid:w$docId", date),
          (graft.functions.Warc.RecordSpec("conversion", Some(uri),
            t.getBytes(UTF_8), "text/plain"), s"urn:uuid:c$docId", date)),
          gzipPerRecord = docId % 2 == 0)
        graft.functions.Warc.wetTexts(bytes) match {
          case Some(ts) if ts.size == 1 =>
            val out = ts.head._2
            // codepoints, not UTF-16 units: DuckDB len() semantics
            (ts.head._1, out.codePointCount(0, out.length).toLong, out == t)
          case _ => ("", -1L, false)
        }
      })
      docs(s, d).select(col("doc_id"),
          wetUdf(col("doc_id"), col("text")).as("m"))
        .select(col("doc_id"), col("m._1").as("uri"),
          col("m._2").as("text_len"), col("m._3").as("roundtrip_ok"))
        .orderBy("doc_id")
    }),
    "q66_webdataset" -> ((s, d) => {
      // X1/S10 — WebDataset tar shards ([[graft.functions.Tar]],
      // [[graft.operators.Webdataset]]): the hand-off format between a
      // crawl's image+caption output and a training loader. The walk is
      // the real ustar grammar — verified checksums, 512-block data,
      // prefix/longname paths (odd docs put every key under a >100-char
      // directory so the GNU `L` records are load-bearing, not
      // decorative) — then the published key convention (basename up to
      // the first dot) groups entries into samples. keys_ok requires
      // the exact expected key sequence IN ORDER; the byte totals are
      // the fixture's closed forms.
      val metaUdf = udf((docId: Long) => {
        val bytes = graft.fixtures.FixtureGen.wdsBytes(docId)
        graft.operators.Webdataset.decode(bytes) match {
          case Some(ss) if ss.nonEmpty =>
            val n = (1 + docId % 4).toInt
            val dir = if (docId % 2 == 1) "deep/" + ("p" * 120) else "shard"
            val wantKeys = (0 until n).map(i => f"$dir/s$i%05d")
            val keysOk = ss.map(_.key) == wantKeys &&
              ss.forall(s => s.image != null && s.caption != null &&
                s.imageExt == "png" && s.nParts == 2)
            (ss.size.toLong,
              ss.map(_.caption.length.toLong).sum,
              ss.map(_.image.length.toLong).sum,
              keysOk)
          case _ => (-1L, -1L, -1L, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("n_samples"),
          col("m._2").as("caption_chars"), col("m._3").as("image_bytes"),
          col("m._4").as("keys_ok"))
        .orderBy("doc_id")
    }),
    "q67_audio_aacmeta" -> ((s, d) => {
      // X1 — ADTS/AAC metadata ([[graft.functions.Aac]]): the web's
      // dominant audio codec, triaged at the frame-header level without
      // sample decode (honestly scoped like MP3/q52). The chain walk
      // self-validates: each frame's 13-bit length must land exactly on
      // the next syncword, and profile/rate/channels may never flip
      // mid-stream.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Aac.audioMeta(
            graft.fixtures.FixtureGen.aacBytes(docId)) match {
          case Some(m) => (m.profile, m.sampleRate.toLong, m.channels.toLong,
            m.nFrames.toLong, m.durationMs, m.crcProtected)
          case None => ("", -1L, -1L, -1L, -1L, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("profile"),
          col("m._2").as("sample_rate"), col("m._3").as("channels"),
          col("m._4").as("n_frames"), col("m._5").as("duration_ms"),
          col("m._6").as("crc"))
        .orderBy("doc_id")
    }),
    "q68_video_h264" -> ((s, d) => {
      // X1 — H.264 SPS metadata ([[graft.functions.H264]]): the web's
      // dominant video codec at the bitstream level — Annex-B NAL scan
      // (skipping the fixture's leading AUD), RBSP emulation-prevention
      // un-escape, exp-Golomb, and the frame-cropping arithmetic that
      // turns macroblock counts into true display dims. Sample decode
      // stays behind the honest stub; the grammar is exact.
      val metaUdf = udf((docId: Long) => {
        graft.functions.H264.spsMeta(
            graft.fixtures.FixtureGen.h264Bytes(docId)) match {
          case Some(m) => (m.width.toLong, m.height.toLong,
            m.profileIdc.toLong, m.levelIdc.toLong, m.cropped,
            m.frameMbsOnly)
          case None => (-1L, -1L, -1L, -1L, false, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("width"),
          col("m._2").as("height"), col("m._3").as("profile"),
          col("m._4").as("level"), col("m._5").as("cropped"),
          col("m._6").as("frame_mbs_only"))
        .orderBy("doc_id")
    }),
    "q69_video_ivf" -> ((s, d) => {
      // X1 — IVF container metadata ([[graft.functions.Ivf]]): the
      // VP8/VP9/AV1 exchange container. The walked frame chain is the
      // truth — the fixture's declared count LIES on d%6=0 and
      // counts_agree must go false there, proving the walk counts
      // frames instead of trusting the header.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Ivf.videoMeta(
            graft.fixtures.FixtureGen.ivfBytes(docId)) match {
          case Some(m) => (m.codec, m.width.toLong, m.height.toLong,
            m.nFrames.toLong, m.declaredFrames.toLong, m.durationMs,
            m.countsAgree)
          case None => ("", -1L, -1L, -1L, -1L, -1L, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("codec"),
          col("m._2").as("width"), col("m._3").as("height"),
          col("m._4").as("n_frames"), col("m._5").as("declared"),
          col("m._6").as("duration_ms"), col("m._7").as("counts_agree"))
        .orderBy("doc_id")
    }),
    "q70_video_vp9" -> ((s, d) => {
      // X1 — VP9 keyframe header ([[graft.functions.Vp9]]): the dims a
      // stream ACTUALLY decodes to, read from the bitstream's fixed
      // keyframe layout (marker, profile, sync code, color config,
      // 16-bit dims) instead of trusted from the container. The fixture
      // container LIES about width on d%5=0 — container_agrees must go
      // false there and the bitstream dims must still be right.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Vp9.fromIvf(
            graft.fixtures.FixtureGen.ivfVp9Bytes(docId)) match {
          case Some((m, agrees)) => (m.width.toLong, m.height.toLong,
            m.profile.toLong, m.bitDepth.toLong, m.colorSpace.toLong,
            agrees)
          case None => (-1L, -1L, -1L, -1L, -1L, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("width"),
          col("m._2").as("height"), col("m._3").as("profile"),
          col("m._4").as("bit_depth"), col("m._5").as("color_space"),
          col("m._6").as("container_agrees"))
        .orderBy("doc_id")
    }),
    "q71_video_av1" -> ((s, d) => {
      // X1 — AV1 sequence-header metadata ([[graft.functions.Av1]]):
      // the OBU grammar (leb128 sizes, temporal-delimiter skip), BOTH
      // header shapes (reduced still-picture / full with operating
      // points), and the variable-bit-width dim fields
      // (frame_width_bits decides how many bits the dims occupy — a
      // fixed-width reader gets every stream wrong). The container
      // lies about height on d%7=0; the bitstream wins.
      val metaUdf = udf((docId: Long) => {
        graft.functions.Av1.fromIvf(
            graft.fixtures.FixtureGen.ivfAv1Bytes(docId)) match {
          case Some((m, agrees)) => (m.width.toLong, m.height.toLong,
            m.profile.toLong, m.levelIdx.toLong, m.reducedHeader, agrees)
          case None => (-1L, -1L, -1L, -1L, false, false)
        }
      })
      docsSpread(s, d).select(col("doc_id"), metaUdf(col("doc_id")).as("m"))
        .select(col("doc_id"), col("m._1").as("width"),
          col("m._2").as("height"), col("m._3").as("profile"),
          col("m._4").as("level"), col("m._5").as("reduced_header"),
          col("m._6").as("container_agrees"))
        .orderBy("doc_id")
    }),
    "q72_wet_pipeline" -> ((s, d) => {
      // S10/C8/A6 composition — the Common Crawl ingest pipeline end to
      // end: each documents row's text is serialized as a WET
      // conversion record, extracted back through the archive layer
      // ([[graft.functions.Warc.wetTexts]]), and the text-analysis
      // family (language ID, quality score, whitespace tokens) runs on
      // the EXTRACTED text. The oracle computes the same three answers
      // over the ORIGINAL parquet text in DuckDB — any text corruption
      // anywhere in the encode→parse→analyze chain diverges.
      import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
      val wetUdf = udf((docId: Long, text: String) => {
        val t = if (text == null) "" else text
        val bytes = graft.functions.Warc.encode("1.1", Vector(
          (graft.functions.Warc.RecordSpec("warcinfo", None,
            "software: graft\r\n".getBytes(US_ASCII),
            "application/warc-fields"), s"urn:uuid:w$docId",
            "2026-08-19T00:00:00Z"),
          (graft.functions.Warc.RecordSpec("conversion",
            Some(s"https://wet.test/doc/$docId"), t.getBytes(UTF_8),
            "text/plain"), s"urn:uuid:c$docId", "2026-08-19T00:00:00Z")),
          gzipPerRecord = docId % 2 == 0)
        graft.functions.Warc.wetTexts(bytes) match {
          case Some(ts) if ts.size == 1 => ts.head._2
          case _ => null
        }
      })
      docsSpread(s, d)
        .select(col("doc_id"), wetUdf(col("doc_id"), col("text")).as("wet"))
        .select(col("doc_id"),
          TextAnalysis.langId(col("wet")).as("lang_pred"),
          TextAnalysis.qualityScore(col("wet")).as("score"),
          TextAnalysis.tokenCount(col("wet")).as("n_ws"))
        .orderBy("doc_id")
    })
  )

  /** Flagship: a deterministic end-to-end mini-crawl (fetched image+caption
    * rows); driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val params = graft.fixtures.FixtureGen.Params(hosts = 2, pagesPerHost = 12)
    val cfg = graft.model.CrawlConfig(
      seedUrls = graft.fixtures.FixtureGen.seeds(params), maxDepth = 4)
    graft.fixtures.FixtureGen.withFixtureEngine(spark, params, cfg, "graft-entry") { engine =>
      engine.run()
      // the result reads committed parquet, so the fixture caches release now
      engine.fetched.select("image_id", "url", "fmt", "caption", "phash", "epoch")
    }
  }

  // =====================================================================

  private val blockedOracleExpr: String = Seq(
    "checking your browser", "\\bcaptcha\\b", "\\baccess denied\\b",
    "\\bcloudflare\\b", "\\bray id\\b", "please enable javascript",
    "ddos protection", "just a moment")
    .map(p => s"(CASE WHEN regexp_matches(content, '(?i)$p') THEN 1 ELSE 0 END)")
    .mkString("(", " + ", ") >= 2")

  private val langOracle: String = {
    def hits(pat: String) = s"len(regexp_extract_all(lower(text), '$pat'))"
    val en = hits("\\b(the|and|of|to|in|is|that|for)\\b")
    val es = hits("\\b(el|la|de|que|y|en|los|una)\\b")
    val fr = hits("\\b(le|les|des|et|un|une|du|est)\\b")
    val de = hits("\\b(der|die|das|und|ist|ein|zu|nicht)\\b")
    val zh = "len(regexp_extract_all(text, '[一-鿿]'))"
    s"""CASE WHEN $zh >= greatest($en, $es, $fr, $de) AND $zh > 0 THEN 'zh'
       WHEN $en >= greatest($es, $fr, $de) AND $en > 0 THEN 'en'
       WHEN $es >= greatest($fr, $de) AND $es > 0 THEN 'es'
       WHEN $fr >= $de AND $fr > 0 THEN 'fr'
       WHEN $de > 0 THEN 'de' ELSE 'unknown' END"""
  }

  /** Python-whitespace char-class body for the DuckDB oracles (same literal
    * characters Hashing.contentHash embeds in its Spark regex). */
  private val pyWs: String = Hashing.PyWs

  /** q31 input: synthetic HTML covering all 7 structured block types,
    * identical expression text in Spark and DuckDB. */
  private val synthHtml: String =
    "concat('<html><head><title>Doc ', doc_id, '</title></head><body>', " +
      "'<h1>Doc ', doc_id, '</h1><p>intro text ', doc_id, '</p>', " +
      "CASE WHEN doc_id % 3 = 0 THEN concat('<pre><code class=\"language-scala\">val x = ', doc_id, '</code></pre>') " +
      "WHEN doc_id % 3 = 1 THEN concat('<ul><li>item a</li><li>item b', doc_id, '</li></ul>') " +
      "ELSE concat('<blockquote>quote ', doc_id, '</blockquote>') END, " +
      "CASE WHEN doc_id % 4 = 0 THEN concat('<table><tr><th>k</th></tr><tr><td>v', doc_id, '</td></tr></table>') ELSE '' END, " +
      "'<img src=\"img-', doc_id, '.png\" alt=\"alt ', doc_id, '\"/><p>tail</p></body></html>')"

  /** q33 input: six designed cleanup classes (mostly-code, short-clean,
    * noisy, broken-table, LaTeX-ish, long-clean). No backslashes: Spark
    * and DuckDB disagree on backslash escapes in SQL string literals. */
  private val synthCleanup: String =
    "CASE WHEN doc_id % 6 = 0 THEN concat('```', chr(10), text, chr(10), '``` t') " +
      "WHEN doc_id % 6 = 1 THEN text " +
      "WHEN doc_id % 6 = 2 THEN concat(text, ' cookie banner privacy policy') " +
      "WHEN doc_id % 6 = 3 THEN concat('|a|b|', chr(10), '|c|d|', chr(10), repeat(text, 60)) " +
      "WHEN doc_id % 6 = 4 THEN concat('$x + y$ math ', repeat(text, 60)) " +
      "ELSE repeat(text, 60) END"

  /** q26 augmentation, shared text between the Spark query and its oracle. */
  private val augTailSql: String =
    "SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 1000000 AS doc_id, text || ' tailword' AS text " +
      "FROM documents WHERE doc_id % 10 = 0"

  /** lazy: q28/q29 oracles recompute their expected tables (image fixture
    * re-validation, reference-simulator crawl) at first access. */
  lazy val oracleSql: Map[String, String] = Map(
    "q25_ann_lsh" -> OracleGen.annLshOracle(dim = 64, numPlanes = 6, k = 10, maxQid = 8),
    "q26_simhash_neardup" -> OracleGen.simhashOracle(augTailSql, maxHamming = 7),
    "q27_fingerprint" -> OracleGen.fingerprintOracle,
    "q28_image_validate" -> OracleGen.imageValidateOracle(200L),
    "q29_crawl_order" -> OracleGen.crawlOrderOracle(
      graft.fixtures.FixtureGen.Params(hosts = 2, pagesPerHost = 20), maxDepth = 5),
    "q30_ann_ivf" -> OracleGen.annIvfOracle(
      dim = 64, k = 8, iters = 3, topK = 10, nProbe = 3, maxQid = 8),
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(30,6)))*100) AS BIGINT) AS sum_qty_c,
         CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6)))*100) AS BIGINT) AS revenue_c,
         count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""",
    "q03_join_agg_nation" ->
      """SELECT n_name, count(*) AS n_orders,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6)))*100) AS BIGINT) AS total_c
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q04_anti_join_unsold_parts" ->
      """SELECT p_partkey FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         ORDER BY p_partkey""",
    "q05_semi_join_active_custs" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q06_except_custs_no_orders" ->
      """SELECT c_custkey FROM customer
         EXCEPT SELECT o_custkey AS c_custkey FROM orders
         ORDER BY c_custkey""",
    "q07_running_sum_supplier" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)*100) AS BIGINT) AS running_c
         FROM lineitem WHERE l_suppkey <= 2
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q08_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(30,6)))*100) AS BIGINT) AS value_c
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q09_sessionize" ->
      """WITH t AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         m AS (
           SELECT user_id, event_id, us,
             CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM t)
         SELECT user_id, session_id, count(*) AS n_events, min(us) AS start_us
         FROM m GROUP BY 1, 2 ORDER BY 1, 2""",
    "q10_url_canonicalize" ->
      s"""SELECT doc_id, $synthUrl AS url,
          concat('https://site-', doc_id % 7, '.test',
            CASE WHEN doc_id % 4 = 0 THEN concat('/Docs/', doc_id)
            WHEN doc_id % 4 = 1 THEN concat('/docs/d', doc_id)
            WHEN doc_id % 4 = 2 THEN concat('/a/./b/../c', doc_id)
            ELSE concat('/q', doc_id, '?x=1&y=2') END) AS canon,
          concat('site-', doc_id % 7, '.test') AS host
          FROM documents ORDER BY doc_id""",
    "q11_url_filter" ->
      s"""WITH c AS (SELECT $synthCorpus AS url FROM documents),
          p AS (SELECT url, regexp_replace(substring(url, 20), '/+$$', '') AS path
                FROM c WHERE url LIKE 'https://site-0.test/%')
          SELECT DISTINCT concat('https://site-0.test', path) AS urlNorm FROM p
          WHERE path LIKE '/docs%'
            AND NOT regexp_matches(lower(path), '\\.(pdf|zip|tar|gz|rar|png|jpg|jpeg|gif|svg|ico|webp|mp4|mp3|wav|avi|mov|doc|docx|xls|xlsx|ppt|pptx|exe|dmg|deb|rpm)$$')
            AND NOT regexp_matches(lower(path), '(/blog/|/changelog/|/api-reference/|/releases/|/download/|/assets/)')
            AND (lower(path) LIKE '%/en/%'
                 OR NOT (lower(path) LIKE '%/es/%' OR lower(path) LIKE '%/fr/%' OR lower(path) LIKE '%/de/%'
                         OR lower(path) LIKE '%/ja/%' OR lower(path) LIKE '%/zh/%' OR lower(path) LIKE '%/pt/%'
                         OR lower(path) LIKE '%/ru/%' OR lower(path) LIKE '%/ko/%' OR lower(path) LIKE '%/kr/%'
                         OR lower(path) LIKE '%/jp/%'))
          ORDER BY urlNorm""",
    "q12_robots_admission" ->
      s"""SELECT path FROM (SELECT $synthPath AS path FROM documents)
          WHERE NOT ((path LIKE '/docs/private/%' AND NOT path LIKE '/docs/private/ok%')
                     OR path LIKE '/tmp%')
          ORDER BY path""",
    "q13_blocked_detect" ->
      s"""SELECT doc_id, $blockedOracleExpr AS blocked
          FROM (SELECT doc_id, $synthContent AS content FROM documents)
          ORDER BY doc_id""",
    "q14_content_hash" ->
      s"""SELECT doc_id,
          md5(regexp_replace(regexp_replace(lower(text), '^[$pyWs]+|[$pyWs]+$$', '', 'g'), '[$pyWs]+', ' ', 'g')) AS md5h,
          substring(sha256($synthFrontierUrl), 1, 16) AS cache_key
          FROM documents ORDER BY doc_id""",
    "q15_politeness_dequeue" ->
      s"""SELECT host, priority, urlNorm FROM (
            SELECT $synthFrontierHost AS host, $synthFrontierUrl AS urlNorm,
              row_number() OVER (PARTITION BY $synthFrontierHost ORDER BY $synthFrontierUrl) AS priority
            FROM documents)
          WHERE priority <= 7 ORDER BY host, priority""",
    "q16_frontier_admission" ->
      s"""SELECT $synthFrontierUrl AS urlNorm FROM documents
          WHERE doc_id % 3 <> 0 ORDER BY urlNorm""",
    "q17_cache_join" ->
      s"""SELECT doc_id, $synthFrontierUrl AS url, (doc_id % 4 = 1) AS cache_hit
          FROM documents ORDER BY doc_id""",
    "q18_langid" ->
      s"""SELECT doc_id, $langOracle AS lang_pred FROM documents ORDER BY doc_id""",
    "q19_quality_score" ->
      """SELECT doc_id, CAST(
           (CASE WHEN len(text) BETWEEN 50 AND 10000 THEN 25 ELSE 0 END) +
           (CASE WHEN words >= 10 THEN 25 ELSE 0 END) +
           (CASE WHEN words > 0 AND len(text)/words BETWEEN 3 AND 12 THEN 25 ELSE 0 END) +
           (CASE WHEN len(text) > 0 AND len(regexp_extract_all(text, '[a-zA-Z0-9 ]'))*100/len(text) >= 70 THEN 25 ELSE 0 END)
           AS INT) AS score
         FROM (SELECT doc_id, text,
                 CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS words
               FROM documents)
         ORDER BY doc_id""",
    "q20_token_counts" ->
      """SELECT doc_id,
           CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_ws,
           len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\x0b\f\ra-zA-Z0-9]+')) AS n_bpe
         FROM documents ORDER BY doc_id""",
    "q21_dedup_exact" ->
      s"""WITH aug AS ($augDocsSql)
          SELECT min(doc_id) AS keep_id, count(*) AS dup_count FROM aug
          GROUP BY md5(regexp_replace(regexp_replace(lower(text), '^[$pyWs]+|[$pyWs]+$$', '', 'g'), '[$pyWs]+', ' ', 'g'))
          HAVING count(*) >= 2 ORDER BY keep_id""",
    "q22_minhash_neardup" ->
      s"""WITH aug AS ($augNearSql),
          g AS (SELECT doc_id,
                  list_distinct([substr(text, CAST(i AS INT), 5)
                                 for i in generate_series(1, greatest(len(text)-4, 0))]) AS sh
                FROM aug)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            len(list_intersect(a.sh, b.sh))::DOUBLE /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
          FROM g a JOIN g b ON b.doc_id = a.doc_id + 1000000
          WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
          ORDER BY id_a""",
    "q23_embedding_topk" ->
      """SELECT qid, id, rank FROM (
           SELECT q.vec_id AS qid, c.vec_id AS id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id) AS rank
           FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 8)
         WHERE rank <= 10 ORDER BY qid, rank""",
    "q24_embedding_neardup" ->
      """WITH aug AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           UNION ALL SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 25
           UNION ALL SELECT vec_id + 2000000,
             list_transform(embedding::DOUBLE[], x -> x * 0.995 + 0.002)
           FROM embeddings WHERE vec_id < 25)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM aug a JOIN aug b
           ON a.vec_id < b.vec_id AND a.vec_id % 1000000 = b.vec_id % 1000000
         WHERE list_cosine_similarity(a.v, b.v) >= 0.95
         ORDER BY id_a, id_b""",
    "q32_chunking" ->
      s"""WITH base AS (SELECT doc_id,
           substr(repeat(text, CAST(ceil(2000.0 / length(text)) AS INT)), 1, 2000) AS t
           FROM documents WHERE length(text) >= 1),
         r AS (
           SELECT doc_id, 1 AS chunk_idx,
             regexp_replace(concat('# Intro ', doc_id, chr(10), chr(10), t),
               '[$pyWs]+$$', '') AS chunk FROM base
           UNION ALL SELECT doc_id, 2,
             regexp_replace(concat('## Part A ', doc_id, chr(10), chr(10), t,
               chr(10), chr(10), '#### deep ', doc_id, chr(10), chr(10), t),
               '[$pyWs]+$$', '') FROM base
           UNION ALL SELECT doc_id, 3,
             regexp_replace(concat('### Part B ', doc_id, chr(10), chr(10), t),
               '[$pyWs]+$$', '') FROM base)
         SELECT doc_id, chunk_idx, chunk FROM r ORDER BY doc_id, chunk_idx""",
    "q33_cleanup_classify" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 6 = 0 THEN 'skip'
                WHEN doc_id % 6 = 1 THEN 'skip'
                WHEN doc_id % 6 = 2 THEN 'cleanup'
                WHEN doc_id % 6 = 3 THEN 'heavy'
                WHEN doc_id % 6 = 4 THEN 'heavy'
                ELSE 'cleanup' END AS level
         FROM documents ORDER BY doc_id""",
    "q34_neardup_resolve" ->
      """WITH aug AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           UNION ALL SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 25
           UNION ALL SELECT vec_id + 2000000,
             list_transform(embedding::DOUBLE[], x -> x * 0.995 + 0.002)
           FROM embeddings WHERE vec_id < 25),
         p AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM aug a JOIN aug b
             ON a.vec_id < b.vec_id AND a.vec_id % 1000000 = b.vec_id % 1000000
           WHERE list_cosine_similarity(a.v, b.v) >= 0.95)
         -- each component is {b, b+1e6[, b+2e6]} and the base b is a member
         -- of every edge set, so the min-id keeper is id % 1000000
         SELECT DISTINCT id, id % 1000000 AS keep_id
         FROM (SELECT id_a AS id FROM p UNION SELECT id_b FROM p)
         ORDER BY id""",
    "q31_structured_blocks" ->
      """WITH d AS (SELECT doc_id FROM documents),
         r AS (
           SELECT doc_id, 1 AS pos, 'heading' AS block_type,
                  concat('Doc ', doc_id) AS content, 1 AS level,
                  NULL AS language, NULL AS alt FROM d
           UNION ALL SELECT doc_id, 2, 'paragraph', concat('intro text ', doc_id),
                  NULL, NULL, NULL FROM d
           UNION ALL SELECT doc_id, 3,
                  CASE WHEN doc_id % 3 = 0 THEN 'code'
                       WHEN doc_id % 3 = 1 THEN 'list' ELSE 'blockquote' END,
                  CASE WHEN doc_id % 3 = 0 THEN concat('val x = ', doc_id)
                       WHEN doc_id % 3 = 1 THEN concat('item a', chr(10), 'item b', doc_id)
                       ELSE concat('quote ', doc_id) END,
                  NULL,
                  CASE WHEN doc_id % 3 = 0 THEN 'scala' ELSE NULL END, NULL FROM d
           UNION ALL SELECT doc_id, 4, 'table', concat('[["k"],["v', doc_id, '"]]'),
                  NULL, NULL, NULL FROM d WHERE doc_id % 4 = 0
           UNION ALL SELECT doc_id, 4 + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END,
                  'image', concat('img-', doc_id, '.png'), NULL, NULL,
                  concat('alt ', doc_id) FROM d
           UNION ALL SELECT doc_id, 5 + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END,
                  'paragraph', 'tail', NULL, NULL, NULL FROM d)
         SELECT doc_id, concat('Doc ', doc_id) AS title, pos, block_type,
                content, level, language, alt
         FROM r ORDER BY doc_id, pos""",
    // q35: the Y4M fixture writes (doc_id%3)+1 uniform frames with luma
    // 16+(31·doc_id+7k)%220 and neutral chroma; BT.601 limited-range decode
    // of (y, 128, 128) is r=g=b=(298·(y−16)+128)>>8, exactly this integer
    // SQL (max luma 235 keeps it ≤255, so the clamp never fires)
    "q35_video_frames" ->
      """SELECT d.doc_id, t.u AS frame_idx,
                (298*((31*d.doc_id + 7*t.u) % 220) + 128) // 256 AS gray
         FROM documents d, unnest(range(d.doc_id % 3 + 1)) AS t(u)
         ORDER BY doc_id, frame_idx""",
    // q36: the WAV fixture is a ±A square wave (A = 1000 + (d%100)·31,
    // 100 + d%50 frames at 8000 Hz): every sample² is A², so RMS == peak
    // == A exactly; duration floors to ms like Features.durationMs
    "q36_audio_features" ->
      """SELECT doc_id, 8000::BIGINT AS sr, 100 + doc_id % 50 AS n_frames,
                1000 + (doc_id % 100) * 31 AS peak,
                1000 + (doc_id % 100) * 31 AS rms,
                (100 + doc_id % 50) * 1000 // 8000 AS dur_ms
         FROM documents ORDER BY doc_id""",
    // q37: the G.711 fixture alternates code byte b0 = (37d)%256 with its
    // exact negation b0^0x80, so peak = RMS = |expand(b0)|; this SQL IS the
    // ITU G.711 expansion (μ-law: complement, (mant·8+132)·2^seg − 132;
    // A-law: toggle 0x55, seg-0 mant·16+8 else (mant·16+264)·2^(seg−1)) —
    // sign bit 0x80 excluded from seg by the %8
    "q37_audio_g711" ->
      """WITH p AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 6 END AS codec,
                  80 + doc_id % 40 AS n_frames,
                  (doc_id * 37) % 256 AS b0
           FROM documents),
         m AS (
           SELECT doc_id, codec, n_frames,
                  CASE WHEN codec = 7
                    THEN ((((255 - b0) % 16) * 8 + 132) << (((255 - b0) // 16) % 8)) - 132
                    ELSE CASE WHEN (xor(b0, 85) // 16) % 8 = 0
                           THEN (xor(b0, 85) % 16) * 16 + 8
                           ELSE ((xor(b0, 85) % 16) * 16 + 264) << ((xor(b0, 85) // 16) % 8 - 1)
                         END
                  END AS mag
           FROM p)
         SELECT doc_id, CAST(codec AS BIGINT) AS codec,
                CAST(n_frames AS BIGINT) AS n_frames,
                CAST(mag AS BIGINT) AS peak, CAST(mag AS BIGINT) AS rms,
                CAST(n_frames * 1000 // 8000 AS BIGINT) AS dur_ms
         FROM m ORDER BY doc_id""",
    // q38: the MJPEG fixture writes (d%3)+1 uniform 16×16 frames; the
    // Spark side proves the real JPEG decode (±4 gate vs the gray formula)
    // and this SQL is the expected outcome — any decode/walk failure
    // flips ok or w/h and reddens the hash
    "q38_video_mjpeg" ->
      """SELECT d.doc_id, t.u AS frame_idx, 16::BIGINT AS w, 16::BIGINT AS h,
                true AS ok
         FROM documents d, unnest(range(d.doc_id % 3 + 1)) AS t(u)
         ORDER BY doc_id, frame_idx""",
    // q39: the IMA ADPCM fixture decodes to a closed-form signal per
    // pattern (see FixtureGen.adpcmBytes): pat 0 block 0 ramps P+4k, its
    // block 1 starts at step index 2 (deltas 7, 7, then 4s → −P + 6+4k
    // from k≥2); pat 1 is P then alternating +32767 (positive clamp) /
    // −28669 = 32767 − 61436 (the table-top diff undershoots the floor);
    // pat 2 is the bare header predictors. This SQL regenerates every sample
    // and aggregates exact integers (sums CAST to BIGINT — HUGEINT never
    // escapes, per the q09 lesson)
    "q39_audio_adpcm" ->
      """WITH p AS (
           SELECT doc_id, 60 + 2*(doc_id % 20) AS nib,
                  (doc_id*131) % 20000 - 10000 AS pred,
                  doc_id % 3 AS pat
           FROM documents),
         s AS (
           SELECT p.doc_id, p.pat, p.nib, b.u AS blk, k.u AS k,
                  CASE WHEN b.u = 0 THEN p.pred ELSE -p.pred END AS p0
           FROM p, unnest(range(2)) AS b(u), unnest(range(p.nib + 1)) AS k(u)),
         v AS (
           SELECT doc_id, nib,
                  CASE WHEN pat = 0 AND blk = 0 THEN p0 + 4*k
                       WHEN pat = 0 THEN p0 + (CASE WHEN k = 0 THEN 0
                                                    WHEN k = 1 THEN 7
                                                    ELSE 6 + 4*k END)
                       WHEN pat = 1 THEN (CASE WHEN k = 0 THEN p0
                                               WHEN k % 2 = 1 THEN 32767
                                               ELSE -28669 END)
                       ELSE p0 END AS val
           FROM s)
         SELECT doc_id, CAST(2*(nib+1) AS BIGINT) AS n_frames,
                CAST(max(abs(val)) AS BIGINT) AS peak,
                CAST(sum(val*val) AS BIGINT) AS sumsq,
                CAST(2*(nib+1) * 1000 // 8000 AS BIGINT) AS dur_ms
         FROM v GROUP BY doc_id, nib ORDER BY doc_id""",
    // q40: the FLAC fixture decodes to a closed-form signal per pattern
    // (see FixtureGen.flacBytes): two frames of b samples with base
    // s0 = P / -P; pat 0 constant s0, pat 1 ramp s0+3k, pat 2 alternating
    // s0·(-1)^k, pat 3 stereo (s0+2k, s0-2k). This SQL regenerates every
    // sample (one row per frame·index·channel) and aggregates exact
    // integers (sums CAST to BIGINT — HUGEINT never escapes)
    "q40_audio_flac" ->
      """WITH p AS (
           SELECT doc_id, 64 + 2*(doc_id % 16) AS b,
                  (doc_id*97) % 16000 - 8000 AS pp,
                  doc_id % 4 AS pat
           FROM documents),
         s AS (
           SELECT p.doc_id, p.pat, p.b,
                  CASE WHEN blk.u = 0 THEN p.pp ELSE -p.pp END AS s0,
                  k.u AS k, c.u AS ch
           FROM p, unnest(range(2)) AS blk(u), unnest(range(p.b)) AS k(u),
                unnest(range(CASE WHEN p.pat = 3 THEN 2 ELSE 1 END)) AS c(u)),
         v AS (
           SELECT doc_id, b, pat,
                  CASE WHEN pat = 0 THEN s0
                       WHEN pat = 1 THEN s0 + 3*k
                       WHEN pat = 2 THEN s0 * (CASE WHEN k % 2 = 0 THEN 1 ELSE -1 END)
                       ELSE s0 + (CASE WHEN ch = 0 THEN 2*k ELSE -2*k END)
                  END AS val
           FROM s)
         SELECT doc_id,
                CAST(CASE WHEN pat = 3 THEN 2 ELSE 1 END AS BIGINT) AS ch,
                8000::BIGINT AS sr,
                CAST(2*b AS BIGINT) AS n_frames,
                CAST(max(abs(val)) AS BIGINT) AS peak,
                CAST(sum(val*val) AS BIGINT) AS sumsq
         FROM v GROUP BY doc_id, b, pat ORDER BY doc_id""",
    // q41: GIF is lossless for in-palette colors, so the decoded gray IS
    // the fixture formula — the oracle emits the expected rows exactly
    "q41_video_gif" ->
      """SELECT d.doc_id, t.u AS frame_idx, 16::BIGINT AS w, 16::BIGINT AS h,
                12 + (37*d.doc_id + 11*t.u) % 232 AS gray
         FROM documents d, unnest(range(d.doc_id % 3 + 1)) AS t(u)
         ORDER BY doc_id, frame_idx""",
    // q42: PNG is lossless — the decoded gray IS the fixture formula
    "q42_video_apng" ->
      """SELECT d.doc_id, t.u AS frame_idx, 16::BIGINT AS w, 16::BIGINT AS h,
                14 + (41*d.doc_id + 17*t.u) % 230 AS gray
         FROM documents d, unnest(range(d.doc_id % 3 + 1)) AS t(u)
         ORDER BY doc_id, frame_idx""",
    // q43: RLE8 is lossless and INTER-FRAME — frame k's background equals
    // frame 0's keyframe gray only if the decoder composited the deltas,
    // so the oracle emits the two-region closed form per frame
    "q43_video_rle" ->
      """SELECT d.doc_id, t.u AS frame_idx, 16::BIGINT AS w, 16::BIGINT AS h,
                20 + (43*d.doc_id) % 225 AS bg_gray,
                CASE WHEN t.u = 0 THEN 20 + (43*d.doc_id) % 225
                     ELSE 20 + (43*d.doc_id + 19*t.u) % 225 END AS patch_gray
         FROM documents d, unnest(range(d.doc_id % 3 + 1)) AS t(u)
         ORDER BY doc_id, frame_idx""",
    // q44: the MS ADPCM fixture decodes to a closed-form signal per
    // pattern (see FixtureGen.msAdpcmBytes): pat 0 is s2-then-s1-repeated
    // (frame-order proof), pat 1 a 2x₁−x₂ linear ramp into BOTH clamp
    // bounds (once clamped the recurrence pins, so least/greatest is
    // exact), pat 2 stereo with one signed nibble per channel then
    // constants. This SQL regenerates every sample (one row per
    // block·frame·channel) and aggregates exact integers (sums CAST to
    // BIGINT — HUGEINT never escapes, per the q09 lesson)
    "q44_audio_msadpcm" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 3 AS pat,
                  50 + 2*(doc_id % 25) AS nib,
                  (113*doc_id) % 18000 - 9000 AS pv,
                  20000 + (doc_id % 100) * 97 AS p1,
                  300 + (doc_id % 50) * 23 AS st,
                  40 + (doc_id % 20) AS nf,
                  64 + (doc_id % 32) AS dl,
                  48 + (doc_id % 16) AS dr
           FROM documents),
         f AS (
           SELECT *, CASE WHEN pat = 2 THEN nf + 2 ELSE nib + 2 END AS spb,
                  CASE WHEN pat = 2 THEN 2 ELSE 1 END AS ch
           FROM p),
         s AS (
           SELECT f.*, b.u AS blk, k.u AS k, c.u AS chn,
                  CASE WHEN b.u = 0 THEN 1 ELSE -1 END AS sg
           FROM f, unnest(range(2)) AS b(u), unnest(range(f.spb)) AS k(u),
                unnest(range(f.ch)) AS c(u)),
         v AS (
           SELECT doc_id, ch, spb,
                  CASE WHEN pat = 0
                         THEN sg*pv + (CASE WHEN k = 0 THEN 0 ELSE 9 END)
                       WHEN pat = 1
                         THEN CASE WHEN blk = 0 THEN least(p1 + st*k, 32767)
                                   ELSE greatest(-p1 - st*k, -32768) END
                       WHEN chn = 0
                         THEN sg*pv + (CASE WHEN k = 0 THEN 0
                                            WHEN k = 1 THEN 11
                                            ELSE 11 + 4*dl END)
                       ELSE -sg*pv + (CASE WHEN k = 0 THEN 0
                                           WHEN k = 1 THEN 5
                                           ELSE 5 - 4*dr END)
                  END AS val
           FROM s)
         SELECT doc_id, CAST(ch AS BIGINT) AS ch,
                CAST(2*spb AS BIGINT) AS n_frames,
                CAST(max(abs(val)) AS BIGINT) AS peak,
                CAST(sum(val*val) AS BIGINT) AS sumsq,
                CAST(2*spb * 1000 // 8000 AS BIGINT) AS dur_ms
         FROM v GROUP BY doc_id, ch, spb ORDER BY doc_id""",
    // q45: QOI is lossless, so the decoded gray IS the fixture formula
    // (no wrap: max value 254) — this SQL regenerates every pixel and
    // aggregates the position-weighted checksum exactly (sums CAST to
    // BIGINT — HUGEINT never escapes, per the q09 lesson)
    "q45_image_qoi" ->
      """WITH p AS (SELECT doc_id, 30 + (29*doc_id) % 180 AS a FROM documents),
         g AS (
           SELECT p.doc_id, x.u AS x, y.u AS y,
                  (p.a + 5*(y.u//4) + x.u*(y.u%3)) % 256 AS v
           FROM p, unnest(range(16)) AS x(u), unnest(range(16)) AS y(u))
         SELECT doc_id, 16::BIGINT AS w, 16::BIGINT AS h,
                CAST(sum(v*(1 + x + 16*y)) AS BIGINT) AS checksum,
                CAST(max(v) AS BIGINT) AS peak
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    // q46: AIFF square wave (peak = A exactly, sumsq = n·A²) and AU G.711
    // square wave (the SAME ITU integer expansion as the q37 oracle — a
    // driver red means the expansion or the container walk diverged);
    // dur_ms floors like Features.durationMs
    "q46_audio_bigendian" ->
      """WITH p AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 2 = 0 THEN 60 + doc_id % 40
                       ELSE 70 + doc_id % 30 END AS n,
                  CASE WHEN doc_id % 2 = 0 THEN 8000 + 1000*(doc_id % 5)
                       ELSE 8000 END AS sr,
                  CASE WHEN doc_id % 2 = 0 THEN 1
                       WHEN doc_id % 4 = 1 THEN 7 ELSE 6 END AS codec,
                  900 + (doc_id % 90) * 37 AS amp,
                  (doc_id * 41) % 256 AS b0
           FROM documents),
         m AS (
           SELECT doc_id, n, sr, codec,
                  CASE WHEN codec = 1 THEN amp
                       WHEN codec = 7
                         THEN ((((255 - b0) % 16) * 8 + 132) << (((255 - b0) // 16) % 8)) - 132
                       ELSE CASE WHEN (xor(b0, 85) // 16) % 8 = 0
                              THEN (xor(b0, 85) % 16) * 16 + 8
                              ELSE ((xor(b0, 85) % 16) * 16 + 264) << ((xor(b0, 85) // 16) % 8 - 1)
                            END
                  END AS mag
           FROM p)
         SELECT doc_id, CAST(codec AS BIGINT) AS codec, CAST(sr AS BIGINT) AS sr,
                CAST(n AS BIGINT) AS n_frames, CAST(mag AS BIGINT) AS peak,
                CAST(n * mag * mag AS BIGINT) AS sumsq,
                CAST(n * 1000 // sr AS BIGINT) AS dur_ms
         FROM m ORDER BY doc_id""",
    // q47: DIB is raw pixels (lossless), so the decoded gray IS the
    // fixture gradient — this SQL regenerates every pixel per frame and
    // aggregates the position-weighted checksum exactly (sums CAST to
    // BIGINT — HUGEINT never escapes, per the q09 lesson)
    "q47_video_dib" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 3 AS pat, doc_id % 3 + 1 AS nf,
                  10 + (29*doc_id) % 160 AS p0
           FROM documents),
         f AS (SELECT p.*, k.u AS k FROM p, unnest(range(p.nf)) AS k(u)),
         g AS (
           SELECT doc_id, k, x.u AS x, y.u AS y,
                  CASE WHEN pat = 1 THEN p0 + 5*((x.u + y.u + 3*k) % 16)
                       ELSE 20 + (31*doc_id + 7*k) % 200 + x.u + 2*y.u
                  END AS v
           FROM f, unnest(range(6)) AS x(u), unnest(range(5)) AS y(u))
         SELECT doc_id, k AS frame_idx, 6::BIGINT AS w, 5::BIGINT AS h,
                CAST(sum(v*(1 + x + 6*y)) AS BIGINT) AS checksum,
                CAST(max(v) AS BIGINT) AS peak
         FROM g GROUP BY doc_id, k ORDER BY doc_id, frame_idx""",
    // q48: VP8L is lossless through every transform combination the
    // fixture cycles, so the decoded gray IS the fixture formula — the
    // same closed-form regeneration as q45, on the 21×13 geometry (A
    // capped at 189 so no pixel ever wraps; sums CAST to BIGINT)
    "q48_image_webp" ->
      """WITH p AS (SELECT doc_id, 20 + (29*doc_id) % 170 AS a FROM documents),
         g AS (
           SELECT p.doc_id, x.u AS x, y.u AS y,
                  (p.a + 5*(y.u//4) + x.u*(y.u%3)) % 256 AS v
           FROM p, unnest(range(21)) AS x(u), unnest(range(13)) AS y(u))
         SELECT doc_id, 21::BIGINT AS w, 13::BIGINT AS h,
                CAST(sum(v*(1 + x + 21*y)) AS BIGINT) AS checksum,
                CAST(max(v) AS BIGINT) AS peak
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    // q49: VP8L is lossless and the animation is INTER-FRAME — frame k's
    // background equals frame 0's full-canvas gray only if the decoder
    // composited the patch deltas, so the oracle emits the two-region
    // closed form per frame (the q43 shape on the WebP container)
    "q49_video_animwebp" ->
      """SELECT d.doc_id, t.u AS frame_idx, 20::BIGINT AS w, 12::BIGINT AS h,
                16 + (47*d.doc_id) % 224 AS bg_gray,
                CASE WHEN t.u = 0 THEN 16 + (47*d.doc_id) % 224
                     ELSE 16 + (47*d.doc_id + 23*t.u) % 224 END AS patch_gray
         FROM documents d, unnest(range(d.doc_id % 3 + 1)) AS t(u)
         ORDER BY doc_id, frame_idx""",
    // q50: ICO DIB/PNG members decode exactly and the BEST (larger)
    // member must be the one selected, so the decoded image IS the
    // quadrant closed form — regenerated here like q48
    "q50_image_ico" ->
      """WITH p AS (SELECT doc_id, 24 + (31*doc_id) % 200 AS ga,
                           16 + (37*doc_id) % 224 AS gb FROM documents),
         g AS (
           SELECT p.doc_id, x.u AS x, y.u AS y,
                  CASE WHEN (x.u < 9) = (y.u < 6) THEN p.ga ELSE p.gb END AS v
           FROM p, unnest(range(18)) AS x(u), unnest(range(11)) AS y(u))
         SELECT doc_id, 18::BIGINT AS w, 11::BIGINT AS h,
                CAST(sum(v*(1 + x + 18*y)) AS BIGINT) AS checksum,
                CAST(max(v) AS BIGINT) AS peak,
                2::BIGINT AS n_members
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    // q51: TGA decode is exact across every wire type the fixture
    // cycles, so the decoded image IS the quadrant closed form
    "q51_image_tga" ->
      """WITH p AS (SELECT doc_id, 28 + (41*doc_id) % 200 AS ga,
                           12 + (53*doc_id) % 228 AS gb FROM documents),
         g AS (
           SELECT p.doc_id, x.u AS x, y.u AS y,
                  CASE WHEN (x.u < 8) = (y.u < 5) THEN p.ga ELSE p.gb END AS v
           FROM p, unnest(range(17)) AS x(u), unnest(range(10)) AS y(u))
         SELECT doc_id, 17::BIGINT AS w, 10::BIGINT AS h,
                CAST(sum(v*(1 + x + 17*y)) AS BIGINT) AS checksum,
                CAST(max(v) AS BIGINT) AS peak
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    // q52: the MP3 metadata walk reads only frame headers, so every
    // field is a closed form of the fixture parameters — the bitrate
    // CASE is the full MPEG1 Layer-III table (indices 1..14), and
    // duration is the floor division the decoder computes
    "q52_audio_mp3meta" ->
      """WITH p AS (
           SELECT doc_id,
                  CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                       ELSE 32000 END AS sr,
                  CASE doc_id % 2 WHEN 0 THEN 1 ELSE 2 END AS ch,
                  40 + doc_id % 30 AS nf,
                  CASE doc_id % 14
                       WHEN 0 THEN 32 WHEN 1 THEN 40 WHEN 2 THEN 48
                       WHEN 3 THEN 56 WHEN 4 THEN 64 WHEN 5 THEN 80
                       WHEN 6 THEN 96 WHEN 7 THEN 112 WHEN 8 THEN 128
                       WHEN 9 THEN 160 WHEN 10 THEN 192 WHEN 11 THEN 224
                       WHEN 12 THEN 256 ELSE 320 END AS kbps
           FROM documents)
         SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(nf AS BIGINT) AS n_frames,
                CAST(kbps AS BIGINT) AS bitrate_kbps,
                CAST(nf * 1152 * 1000 // sr AS BIGINT) AS duration_ms
         FROM p ORDER BY doc_id""",
    // q53: the MP4 box walk reads only moov headers, so every field is
    // a closed form of the fixture parameters — 40 ms per video sample
    // (delta 512 at timescale 12800), codecs/brands/dims cycling by
    // doc_id residues; the v1-box / largesize / uuid structure variants
    // change the wire layout but no output
    "q53_video_mp4meta" ->
      """WITH p AS (
           SELECT doc_id,
                  24 + doc_id % 48 AS n,
                  CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                       ELSE 'mp41' END AS brand,
                  CASE doc_id % 4 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
                       WHEN 2 THEN 'vp09' ELSE 'av01' END AS vcodec,
                  160 + 16*(doc_id % 28) AS w,
                  90 + 2*(doc_id % 40) AS h,
                  CASE doc_id % 2 WHEN 0 THEN 'mp4a' ELSE 'Opus' END AS acodec,
                  CASE doc_id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
                       ELSE 32000 END AS arate,
                  1 + doc_id % 2 AS ach
           FROM documents)
         SELECT doc_id, brand, CAST(40*n AS BIGINT) AS duration_ms,
                vcodec AS video_codec, CAST(w AS BIGINT) AS w,
                CAST(h AS BIGINT) AS h, CAST(n AS BIGINT) AS n_video_samples,
                acodec AS audio_codec, CAST(arate AS BIGINT) AS audio_rate,
                CAST(ach AS BIGINT) AS audio_channels
         FROM p ORDER BY doc_id""",
    // q54: SOF dims are the fixture's synthetic image dims (the JDK
    // encodes at image size); every EXIF field is the doc_id closed
    // form the fixture writes — byte order and GPS-IFD presence rotate
    // by residue, but only has_gps is an output
    "q54_image_exif" ->
      """SELECT doc_id,
                CAST(24 + doc_id % 40 AS BIGINT) AS w,
                CAST(16 + doc_id % 32 AS BIGINT) AS h,
                CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
                'cam-' || (doc_id % 5) AS make,
                'm-' || (doc_id % 7) AS model,
                '2026:0' || (1 + doc_id % 9) || ':15 12:00:00' AS taken_at,
                CAST(1000 + doc_id % 100 AS BIGINT) AS exif_w,
                CAST(2000 + doc_id % 50 AS BIGINT) AS exif_h,
                CAST(100 * (1 + doc_id % 16) AS BIGINT) AS iso,
                doc_id % 3 = 0 AS has_gps
         FROM documents ORDER BY doc_id""",
    // q55: the Ogg walk reads granules and ident headers only, so every
    // field is the doc_id closed form the fixture encodes — Vorbis
    // duration is granule·1000/rate with granule = (rate/100)(20+d%30),
    // Opus is (granule−preSkip)/48 kHz with granule = preSkip+4800(10+d%90)
    "q55_audio_oggmeta" ->
      """SELECT doc_id,
                CASE doc_id % 2 WHEN 0 THEN 'vorbis' ELSE 'opus' END AS codec,
                CAST(1 + (doc_id % 6) // 3 AS BIGINT) AS channels,
                CAST(CASE WHEN doc_id % 2 = 0 THEN
                       CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                            ELSE 32000 END
                     ELSE 48000 END AS BIGINT) AS sample_rate,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                     ELSE 312 + doc_id % 100 END AS BIGINT) AS pre_skip,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 10 * (20 + doc_id % 30)
                     ELSE 100 * (10 + doc_id % 90) END AS BIGINT) AS duration_ms,
                CAST(5 + doc_id % 5 AS BIGINT) AS n_pages
         FROM documents ORDER BY doc_id""",
    // q56: the EBML walk reads headers only — every field is the
    // fixture's doc_id closed form (duration floats are integers well
    // under 2^24, exact in both float widths)
    "q56_video_mkvmeta" ->
      """SELECT doc_id,
                CASE doc_id % 2 WHEN 0 THEN 'webm' ELSE 'matroska' END AS doc_type,
                CAST(5000 + 250 * (doc_id % 37) AS BIGINT) AS duration_ms,
                CASE doc_id % 4 WHEN 0 THEN 'V_VP8' WHEN 1 THEN 'V_VP9'
                     WHEN 2 THEN 'V_AV1' ELSE 'V_MPEG4/ISO/AVC' END AS video_codec,
                CAST(320 + 16 * (doc_id % 20) AS BIGINT) AS w,
                CAST(180 + 2 * (doc_id % 50) AS BIGINT) AS h,
                CASE doc_id % 2 WHEN 0 THEN 'A_OPUS' ELSE 'A_VORBIS' END AS audio_codec,
                CAST(CASE doc_id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
                     ELSE 32000 END AS BIGINT) AS audio_rate,
                CAST(1 + doc_id % 2 AS BIGINT) AS audio_channels
         FROM documents ORDER BY doc_id""",
    // q57: content triage routes each payload by SNIFFED container; the
    // fixture family is doc_id%12 with the generator keyed by the
    // QUOTIENT, so every family crosses every residue class. Each branch
    // below is that family's already-driver-green closed form (q35/q36/
    // q41/q45/q48/q50/q52-q56); fam 7 (GIF) is image at 1 frame (q%3=0)
    // and video otherwise; fam 11 (TGA) is signature-less → unknown
    "q57_media_triage" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 12 AS fam, doc_id // 12 AS q
           FROM documents)
         SELECT doc_id,
           CASE WHEN fam IN (0, 8, 9, 10) THEN 'image'
                WHEN fam IN (1, 2, 6) THEN 'video'
                WHEN fam IN (3, 4, 5) THEN 'audio'
                WHEN fam = 7 THEN CASE WHEN q % 3 = 0 THEN 'image' ELSE 'video' END
                ELSE 'unknown' END AS kind,
           CASE fam WHEN 0 THEN 'jpeg' WHEN 1 THEN 'mp4'
                WHEN 2 THEN CASE q % 2 WHEN 0 THEN 'webm' ELSE 'matroska' END
                WHEN 3 THEN 'ogg' WHEN 4 THEN 'wav' WHEN 5 THEN 'mpeg'
                WHEN 6 THEN 'y4m' WHEN 7 THEN 'gif' WHEN 8 THEN 'qoi'
                WHEN 9 THEN 'webp' WHEN 10 THEN 'ico'
                ELSE 'unknown' END AS container,
           CASE fam WHEN 0 THEN 'jpeg'
                WHEN 1 THEN CASE q % 4 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
                     WHEN 2 THEN 'vp09' ELSE 'av01' END
                WHEN 2 THEN CASE q % 4 WHEN 0 THEN 'V_VP8' WHEN 1 THEN 'V_VP9'
                     WHEN 2 THEN 'V_AV1' ELSE 'V_MPEG4/ISO/AVC' END
                WHEN 3 THEN CASE q % 2 WHEN 0 THEN 'vorbis' ELSE 'opus' END
                WHEN 4 THEN 'pcm' WHEN 5 THEN 'mp3' WHEN 6 THEN 'rawvideo'
                WHEN 7 THEN 'gif' WHEN 8 THEN 'qoi' WHEN 9 THEN 'vp8l'
                WHEN 10 THEN 'ico' ELSE '' END AS codec,
           CAST(CASE fam WHEN 0 THEN 24 + q % 40
                WHEN 1 THEN 160 + 16 * (q % 28) WHEN 2 THEN 320 + 16 * (q % 20)
                WHEN 6 THEN 8 WHEN 7 THEN 16 WHEN 8 THEN 16 WHEN 9 THEN 21
                WHEN 10 THEN 18 ELSE -1 END AS BIGINT) AS w,
           CAST(CASE fam WHEN 0 THEN 16 + q % 32
                WHEN 1 THEN 90 + 2 * (q % 40) WHEN 2 THEN 180 + 2 * (q % 50)
                WHEN 6 THEN 4 WHEN 7 THEN 16 WHEN 8 THEN 16 WHEN 9 THEN 13
                WHEN 10 THEN 11 ELSE -1 END AS BIGINT) AS h,
           CAST(CASE fam WHEN 1 THEN 40 * (24 + q % 48)
                WHEN 2 THEN 5000 + 250 * (q % 37)
                WHEN 3 THEN CASE WHEN q % 2 = 0 THEN 10 * (20 + q % 30)
                     ELSE 100 * (10 + q % 90) END
                WHEN 4 THEN (100 + q % 50) * 1000 // 8000
                WHEN 5 THEN (40 + q % 30) * 1152 * 1000 //
                     (CASE q % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END)
                ELSE -1 END AS BIGINT) AS duration_ms,
           CAST(CASE fam
                WHEN 1 THEN CASE q % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100 ELSE 32000 END
                WHEN 2 THEN CASE q % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100 ELSE 32000 END
                WHEN 3 THEN CASE WHEN q % 2 = 0 THEN
                       CASE q % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
                     ELSE 48000 END
                WHEN 4 THEN 8000
                WHEN 5 THEN CASE q % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
                ELSE -1 END AS BIGINT) AS sample_rate,
           CAST(CASE fam WHEN 1 THEN 1 + q % 2 WHEN 2 THEN 1 + q % 2
                WHEN 3 THEN 1 + (q % 6) // 3 WHEN 4 THEN 1
                WHEN 5 THEN 1 + q % 2 ELSE -1 END AS BIGINT) AS channels
         FROM p ORDER BY doc_id""",
    // q58: the HEIF item walk reads headers only — every field is the
    // fixture's doc_id closed form; the pitm/ipma wire variants
    // (32-bit pitm, 15-bit indices) must not move any output
    "q58_image_heif" ->
      """SELECT doc_id,
                CASE doc_id % 2 WHEN 0 THEN 'avif' ELSE 'heic' END AS brand,
                CASE doc_id % 2 WHEN 0 THEN 'av01' ELSE 'hvc1' END AS codec,
                CAST(64 + 4 * (doc_id % 50) AS BIGINT) AS w,
                CAST(48 + 2 * (doc_id % 60) AS BIGINT) AS h,
                CAST(90 * (doc_id % 4) AS BIGINT) AS rotation,
                CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_items,
                doc_id % 3 = 0 AS has_exif
         FROM documents ORDER BY doc_id""",
    // q59: the SVG walk resolves the fixture's closed forms — the pt
    // case is exact (3k pt = 4k px at 96 dpi), the viewBox-only case
    // falls back, element census counts svg + rects + script + image
    "q59_image_svg" ->
      """SELECT doc_id,
                CAST(CASE WHEN doc_id % 4 = 3 THEN 4 * (25 + doc_id % 60)
                     ELSE 100 + doc_id % 200 END AS BIGINT) AS w,
                CAST(CASE WHEN doc_id % 4 = 3 THEN 4 * (15 + doc_id % 40)
                     ELSE 50 + doc_id % 150 END AS BIGINT) AS h,
                CAST(2 + doc_id % 4
                     + (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                     + (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_elements,
                (doc_id % 3 = 0 OR doc_id % 7 = 0) AS has_script,
                doc_id % 5 = 0 AS has_external_ref
         FROM documents ORDER BY doc_id""",
    // q60: every field is the PDF fixture's closed form; xref_kind and
    // incremental prove the table/stream/Prev parser paths each ran,
    // and has_js includes the d%3=2 term because the INCREMENTAL
    // update's newer catalog adds OpenAction JS (newest-entry-wins)
    "q60_doc_pdf" ->
      """SELECT doc_id,
                '1.' || CAST(4 + doc_id % 4 AS VARCHAR) AS version,
                CAST(1 + doc_id % 9 AS BIGINT) AS n_pages,
                doc_id % 5 = 0 AS encrypted,
                (doc_id % 7 = 0 OR doc_id % 11 = 0 OR doc_id % 3 = 2) AS has_js,
                doc_id % 13 = 0 AS has_attachments,
                CASE WHEN doc_id % 3 = 0 THEN 'stream' ELSE 'table' END AS xref_kind,
                doc_id % 3 = 2 AS incremental
         FROM documents ORDER BY doc_id""",
    // q61: every field is the WARC fixture's closed form; digest_ok
    // carries the d%17=0 corrupted-digest docs (the sha1/base32 check
    // must FAIL there), n_records the metadata/revisit presence terms
    "q61_archive_warc" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN '1.1' ELSE '1.0' END AS version,
                doc_id % 3 = 0 AS gzipped,
                CAST(3 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                       + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                     AS BIGINT) AS n_records,
                CAST(CASE WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END
                     AS BIGINT) AS http_status,
                CASE CAST(doc_id % 4 AS INTEGER)
                     WHEN 0 THEN 'text/html'
                     WHEN 1 THEN 'image/png'
                     WHEN 2 THEN 'application/json'
                     ELSE 'text/plain' END AS content_type,
                CAST(10 + doc_id % 90 AS BIGINT) AS payload_len,
                doc_id % 17 <> 0 AS digest_ok,
                doc_id % 7 = 0 AS has_revisit
         FROM documents ORDER BY doc_id""",
    // q62: every field is the DOCX fixture's closed form; n_words is the
    // paragraph-count × words-per-paragraph product, doc_method the
    // stored/deflate cycle, zip64 the EOCD64 docs
    "q62_doc_docx" ->
      """SELECT doc_id,
                CAST(6 + CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END
                     AS BIGINT) AS n_entries,
                CAST(1 + doc_id % 6 AS BIGINT) AS n_paragraphs,
                CAST((1 + doc_id % 6) * (2 + doc_id % 5) AS BIGINT) AS n_words,
                'Doc ' || CAST(doc_id AS VARCHAR) AS title,
                'author-' || CAST(doc_id % 9 AS VARCHAR) AS creator,
                doc_id % 11 = 0 AS has_macros,
                doc_id % 7 = 0 AS has_external_ref,
                CASE WHEN doc_id % 2 = 0 THEN 'stored' ELSE 'deflate' END
                  AS doc_method,
                doc_id % 13 = 0 AS zip64
         FROM documents ORDER BY doc_id""",
    // q63: the fixture cycle is the closed form — three document
    // containers routed by magic plus a wav control that must stay audio
    "q63_doc_triage" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 4 = 3 THEN 'audio' ELSE 'document' END
                  AS kind,
                CASE CAST(doc_id % 4 AS INTEGER)
                     WHEN 0 THEN 'pdf'
                     WHEN 1 THEN 'warc'
                     WHEN 2 THEN 'docx'
                     ELSE 'wav' END AS container
         FROM documents ORDER BY doc_id""",
    // q64: surt/ts/mime/status are the WARC fixture's closed form
    // (host-k.test reversed to test,host-k; the WARC-Date second field);
    // replay_ok=true asserts the Scala-side offset replay round-trip ran
    // and succeeded for every line of every archive
    "q64_archive_cdx" ->
      """SELECT doc_id,
                'test,host-' || CAST(doc_id % 9 AS VARCHAR) || ')/page/' ||
                  CAST(doc_id AS VARCHAR) AS surt,
                '202608190000' ||
                  lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS ts,
                CASE CAST(doc_id % 4 AS INTEGER)
                     WHEN 0 THEN 'text/html'
                     WHEN 1 THEN 'image/png'
                     WHEN 2 THEN 'application/json'
                     ELSE 'text/plain' END AS mime,
                CAST(CASE WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END
                     AS BIGINT) AS status,
                CAST(1 AS BIGINT) AS n_lines,
                true AS replay_ok
         FROM documents ORDER BY doc_id""",
    // q65: text_len is a genuine cross-engine comparison — DuckDB
    // measures the parquet text directly, Spark measures it AFTER a
    // WARC conversion-record round-trip; any grammar/byte-count bug in
    // the WET path shows as a length or roundtrip_ok divergence
    "q65_archive_wet" ->
      """SELECT doc_id,
                'https://wet.test/doc/' || CAST(doc_id AS VARCHAR) AS uri,
                CAST(len(text) AS BIGINT) AS text_len,
                true AS roundtrip_ok
         FROM documents ORDER BY doc_id""",
    // q66: sample count and byte totals are the shard fixture's closed
    // forms; keys_ok carries the Scala-side exact key-sequence check
    // (incl. the odd-doc GNU-longname keys the oracle can't express)
    "q66_webdataset" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 4 AS BIGINT) AS n_samples,
                CAST((1 + doc_id % 4) * (3 + doc_id % 6) AS BIGINT)
                  AS caption_chars,
                CAST((1 + doc_id % 4) * (10 + doc_id % 30) AS BIGINT)
                  AS image_bytes,
                true AS keys_ok
         FROM documents ORDER BY doc_id""",
    // q67: the ADTS fixture's closed forms; duration is the exact
    // integer math the walk does (frames * 1024 samples / rate, floor)
    "q67_audio_aacmeta" ->
      """SELECT doc_id,
                CASE CAST(doc_id % 4 AS INTEGER)
                     WHEN 0 THEN 'main' WHEN 1 THEN 'lc'
                     WHEN 2 THEN 'ssr' ELSE 'ltp' END AS profile,
                CAST(CASE CAST(doc_id % 9 AS INTEGER)
                     WHEN 0 THEN 96000 WHEN 1 THEN 88200 WHEN 2 THEN 64000
                     WHEN 3 THEN 48000 WHEN 4 THEN 44100 WHEN 5 THEN 32000
                     WHEN 6 THEN 24000 WHEN 7 THEN 22050 ELSE 16000 END
                     AS BIGINT) AS sample_rate,
                CAST(1 + doc_id % 5 AS BIGINT) AS channels,
                CAST(3 + doc_id % 6 AS BIGINT) AS n_frames,
                CAST((3 + doc_id % 6) * 1024 * 1000 //
                     CASE CAST(doc_id % 9 AS INTEGER)
                     WHEN 0 THEN 96000 WHEN 1 THEN 88200 WHEN 2 THEN 64000
                     WHEN 3 THEN 48000 WHEN 4 THEN 44100 WHEN 5 THEN 32000
                     WHEN 6 THEN 24000 WHEN 7 THEN 22050 ELSE 16000 END
                     AS BIGINT) AS duration_ms,
                doc_id % 5 = 0 AS crc
         FROM documents ORDER BY doc_id""",
    // q68: dims are the fixture's closed forms and are NOT
    // macroblock-aligned in general — a parser without the crop math
    // would report the 16-rounded dims and red here
    "q68_video_h264" ->
      """SELECT doc_id,
                CAST(160 + 2 * (doc_id % 120) AS BIGINT) AS width,
                CAST(180 + 2 * (doc_id % 100) AS BIGINT) AS height,
                CAST(66 AS BIGINT) AS profile,
                CAST(30 + doc_id % 21 AS BIGINT) AS level,
                ((160 + 2 * (doc_id % 120)) % 16 <> 0 OR
                 (180 + 2 * (doc_id % 100)) % 16 <> 0) AS cropped,
                true AS frame_mbs_only
         FROM documents ORDER BY doc_id""",
    // q69: the walked chain is the truth; declared lies on d%6=0
    "q69_video_ivf" ->
      """SELECT doc_id,
                CASE CAST(doc_id % 3 AS INTEGER)
                     WHEN 0 THEN 'vp80' WHEN 1 THEN 'vp90'
                     ELSE 'av01' END AS codec,
                CAST(320 + 2 * (doc_id % 200) AS BIGINT) AS width,
                CAST(180 + 2 * (doc_id % 150) AS BIGINT) AS height,
                CAST(2 + doc_id % 7 AS BIGINT) AS n_frames,
                CAST(2 + doc_id % 7 +
                     CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END
                     AS BIGINT) AS declared,
                CAST((2 + doc_id % 7) * 1000 // 30 AS BIGINT) AS duration_ms,
                doc_id % 6 <> 0 AS counts_agree
         FROM documents ORDER BY doc_id""",
    // q70: dims are the BITSTREAM's closed form (the container lies on
    // d%5=0 and must be flagged, not believed)
    "q70_video_vp9" ->
      """SELECT doc_id,
                CAST(176 + 2 * (doc_id % 160) AS BIGINT) AS width,
                CAST(144 + 2 * (doc_id % 120) AS BIGINT) AS height,
                CAST(0 AS BIGINT) AS profile,
                CAST(8 AS BIGINT) AS bit_depth,
                CAST(1 + doc_id % 5 AS BIGINT) AS color_space,
                doc_id % 5 <> 0 AS container_agrees
         FROM documents ORDER BY doc_id""",
    // q71: the AV1 fixture's closed forms; the container lies about
    // height on d%7=0 and must be flagged, not believed
    "q71_video_av1" ->
      """SELECT doc_id,
                CAST(128 + 2 * (doc_id % 180) AS BIGINT) AS width,
                CAST(96 + 2 * (doc_id % 140) AS BIGINT) AS height,
                CAST(doc_id % 3 AS BIGINT) AS profile,
                CAST(doc_id % 24 AS BIGINT) AS level,
                doc_id % 2 = 0 AS reduced_header,
                doc_id % 7 <> 0 AS container_agrees
         FROM documents ORDER BY doc_id""",
    // q72: the q18/q19/q20 answers computed over the ORIGINAL parquet
    // text — the Spark side computes them over the WET-round-tripped
    // text, so equality proves the whole archive chain is transparent
    "q72_wet_pipeline" ->
      ("SELECT doc_id, " + langOracle + " AS lang_pred," +
        // plain (non-interpolated) literal below: the \t\x0b escapes
        // must reach DuckDB verbatim, exactly as in the q19/q20 oracles
        """
           CAST(
             (CASE WHEN len(text) BETWEEN 50 AND 10000 THEN 25 ELSE 0 END) +
             (CASE WHEN words >= 10 THEN 25 ELSE 0 END) +
             (CASE WHEN words > 0 AND len(text)/words BETWEEN 3 AND 12 THEN 25 ELSE 0 END) +
             (CASE WHEN len(text) > 0 AND len(regexp_extract_all(text, '[a-zA-Z0-9 ]'))*100/len(text) >= 70 THEN 25 ELSE 0 END)
             AS INT) AS score,
           CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_ws
         FROM (SELECT doc_id, text,
                 CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS words
               FROM documents)
         ORDER BY doc_id""")
  )
}
