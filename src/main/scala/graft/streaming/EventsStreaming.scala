package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** §2.8 — incremental semantics as Structured Streaming.
  *
  * The engine's epoch loop is the chosen incremental engine for the crawl
  * itself (exact-replay determinism, SURVEY ST1), but the streaming-shaped
  * mechanisms are provided as first-class Structured Streaming operators:
  *
  *  - [[hourlyCounts]] — event-time tumbling window + watermark (the
  *    telemetry/metrics stream, D9/D10 analog)
  *  - [[politenessThrottle]] — `flatMapGroupsWithState` keyed by host:
  *    per-host token-bucket admission, the continuous-mode frontier
  *    scheduler sketch (documented future work in SURVEY §2.8).
  */
object EventsStreaming {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Per-query upsert stores backing [[hourlyCounts]]: Update-mode output
    * must land in a sink that upserts by key — the memory sink only
    * APPENDS, so a window updated across several micro-batches would leave
    * duplicate rows a consumer cannot tell apart (production analog:
    * Iceberg MERGE INTO / a compacted topic). Row volume is bounded by
    * windows × event types, so a driver-side map is the honest test-scale
    * stand-in. */
  private val upsertStores = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[(Long, String), (Long, Long)]]()

  /** File-stream over an events DIRECTORY → watermarked hourly windows →
    * foreachBatch upsert sink keyed by (window, event_type); read the final
    * per-window rows with [[hourlyResult]] (synchronous for tests via
    * Trigger.AvailableNow). */
  def hourlyCounts(spark: SparkSession, eventsDir: String, queryName: String,
      /** cap files per micro-batch (tests force multi-batch windows with
        * it; None = source default, usually one AvailableNow batch). */
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(eventSchema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(eventsDir)
    // event time must be TIMESTAMP (watermarks reject NTZ), but a bare
    // session-local cast made hourly buckets depend on
    // spark.sql.session.timeZone (naive 10:15 and 10:45 in a +05:30 zone
    // landed in different UTC-aligned windows). ntzAsUtcInstant pins the
    // wall-clock as a session-independent instant, so windows are
    // zone-free wall-clock hours matching the batch q08 date_trunc.
    val agg = stream
      .withColumn("ts_utc", graft.functions.TimeFns.ntzAsUtcInstant(col("ts")))
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")) * 100).cast("long").as("value_c"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("value_c"))
    upsertStores.remove(queryName) // fresh store per query start
    val store = upsertStores.computeIfAbsent(queryName,
      _ => new java.util.concurrent.ConcurrentHashMap[(Long, String), (Long, Long)]())
    agg.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // collect is bounded: only windows UPDATED this batch, each one
        // row — upsert makes re-delivered updates idempotent
        batch.collect().foreach { r =>
          store.put((r.getAs[java.sql.Timestamp]("hour").getTime,
            r.getAs[String]("event_type")),
            (r.getAs[Long]("n"), r.getAs[Long]("value_c")))
        }
        ()
      }
      .queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Final per-window rows accumulated by [[hourlyCounts]]'s upsert sink. */
  def hourlyResult(spark: SparkSession, queryName: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    Option(upsertStores.get(queryName)).map(_.asScala.toSeq).getOrElse(Seq.empty)
      .map { case ((hourMs, eventType), (n, valueC)) =>
        (new java.sql.Timestamp(hourMs), eventType, n, valueC)
      }.toDF("hour", "event_type", "n", "value_c")
  }

  final case class FrontierReq(host: String, urlNorm: String, priority: Long)
  final case class HostBudgetState(
      admittedTotal: Long, pending: Seq[FrontierReq] = Seq.empty)
  final case class Admitted(host: String, urlNorm: String, admittedSeq: Long)

  /** One state transition of the per-host token bucket — pure, so the
    * timeout (quiet-host drain) branch is unit-testable without a clock:
    * merge deferred tail + incoming, sort by (priority, urlNorm), admit up
    * to `budget`, defer the rest. */
  def advanceBudget(host: String, prev: HostBudgetState,
      incoming: Seq[FrontierReq], budget: Int): (HostBudgetState, Seq[Admitted]) = {
    val queue = (prev.pending ++ incoming).sortBy(r => (r.priority, r.urlNorm))
    val (admit, defer) = queue.splitAt(budget)
    (HostBudgetState(prev.admittedTotal + admit.size, defer),
      admit.zipWithIndex.map { case (r, i) =>
        Admitted(host, r.urlNorm, prev.admittedTotal + i + 1)
      })
  }

  /** Per-host stateful admission: at most `budgetPerBatch` URLs per host per
    * micro-batch, cumulative count kept in state — the W3 politeness window
    * expressed as `flatMapGroupsWithState` for a continuously-arriving
    * frontier. Requests over budget are DEFERRED in state (not dropped —
    * a token bucket must never lose frontier URLs) and compete with newer
    * arrivals in strict (priority, urlNorm) order on the host's next batch
    * — the same priority semantics as the batch dequeue (W3), which means
    * a sustained flood of higher-priority arrivals defers lower-priority
    * URLs for as long as it lasts (that ordering is the frontier's point;
    * the deferred tail is host backlog, the streaming analog of the batch
    * pending table, and is never lost). A host with a deferred tail arms a
    * ProcessingTimeTimeout heartbeat so a QUIET host (no new input) still
    * drains `budgetPerBatch` per `drainIntervalMs` instead of stranding
    * its tail forever. Deterministic: the merged pending+incoming queue is
    * sorted by (priority, urlNorm) before admission. */
  def politenessThrottle(reqs: Dataset[FrontierReq], budgetPerBatch: Int,
      drainIntervalMs: Long = 1000L): Dataset[Admitted] = {
    import reqs.sparkSession.implicits._
    reqs.groupByKey(_.host)
      .flatMapGroupsWithState[HostBudgetState, Admitted](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (host: String, it: Iterator[FrontierReq], state: GroupState[HostBudgetState]) =>
          val prev = state.getOption.getOrElse(HostBudgetState(0L))
          val incoming = if (state.hasTimedOut) Seq.empty else it.toSeq
          val (next, admitted) = advanceBudget(host, prev, incoming, budgetPerBatch)
          state.update(next)
          if (next.pending.nonEmpty) state.setTimeoutDuration(drainIntervalMs)
          admitted.iterator
      }
  }

  /** Drive [[politenessThrottle]] over a rate-limited file stream of
    * frontier requests (for tests/demo): returns the query writing to a
    * memory sink. Continuous ProcessingTime trigger — the timeout-based
    * quiet-host drain needs the stream to keep ticking (AvailableNow
    * would spin no-data batches forever against timeout-bearing state);
    * the caller polls the sink and stops the query. */
  def throttleQuery(spark: SparkSession, frontierDir: String, queryName: String,
      budgetPerBatch: Int, drainIntervalMs: Long = 1000L): StreamingQuery = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("host", StringType), StructField("urlNorm", StringType),
      StructField("priority", LongType)))
    val reqs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(frontierDir)
      .as[FrontierReq]
    politenessThrottle(reqs, budgetPerBatch, drainIntervalMs)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
  }
}
