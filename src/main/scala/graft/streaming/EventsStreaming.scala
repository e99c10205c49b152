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

  /** File-stream over an events DIRECTORY → watermarked hourly windows →
    * memory sink (synchronous for tests via Trigger.AvailableNow). */
  def hourlyCounts(spark: SparkSession, eventsDir: String, queryName: String): StreamingQuery = {
    val stream = spark.readStream.schema(eventSchema).parquet(eventsDir)
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
    agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
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
    * a token bucket must never lose frontier URLs) and re-emitted ahead of
    * newer arrivals on the host's next batch. A host with a deferred tail
    * arms a ProcessingTimeTimeout heartbeat so a QUIET host (no new input)
    * still drains `budgetPerBatch` per `drainIntervalMs` instead of
    * stranding its tail forever. Deterministic: the merged pending+incoming
    * queue is sorted by (priority, urlNorm) before admission. */
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
