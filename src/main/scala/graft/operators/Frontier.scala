package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** D1/W3 — the partitioned priority frontier: per-host politeness dequeue.
  *
  * The reference serializes fetches with one semaphore + a per-page sleep
  * (`src/jobs/runner.py:377,731`); relationally that is "top-`budget` URLs
  * per host per epoch in priority order" — identical admitted sets per epoch
  * window, fully parallel across hosts.
  *
  * Skew: `row_number` over a single giant host is one task at 10^10 scale,
  * so the dequeue is two-phase — rank within (host, salt) first (parallel,
  * keeps ≤ salt×budget rows per host), then the exact per-host top-budget
  * over that reduced set. Deterministic: priority is a total order per host.
  */
object Frontier {

  /** Assign per-host priorities = lexicographic rank of urlNorm, matching
    * the reference's `sorted(filtered)` dispatch order (`filter.py:101`,
    * `runner.py:781` — W1). Two-phase (see [[rankPerHost]]): a 10^9-URL
    * single host never serializes into one window task. */
  def prioritize(pending: DataFrame): DataFrame =
    rankPerHost(pending, Seq(col("urlNorm")), "priority")

  /** Exact per-host dense rank with NO single-task-per-host window — the
    * 10^10-frontier shape. Semantics are identical to
    * `row_number().over(Window.partitionBy(host).orderBy(orderCols))` for a
    * tie-free per-host order key (both call sites end in `urlNorm`, unique
    * in pending):
    *
    *  1. range-partition by (host, orderCols…) — a giant host spans many
    *     contiguous partitions, each bounded by the shuffle partition size;
    *  2. rank locally within (host, partition) — every such group lives in
    *     one bounded partition;
    *  3. add per-host count-prefix-sum offsets over earlier partitions (a
    *     window over ≤ numShufflePartitions rows per host, broadcast-joined
    *     back).
    *
    * The sampled range shuffle is evaluated EXACTLY ONCE (eager
    * localCheckpoint) before the two consumers below read it. This is
    * load-bearing, not an optimization: RangePartitioner samples with an
    * rdd-id-derived seed, so if the offsets branch and the main branch each
    * planned their own (column-pruned) copy of the exchange, the two could
    * sample different boundaries, desync `__pid`, and the merge join would
    * silently drop whole (host, partition) groups. Exchange reuse would
    * usually save this, but it is a physical-plan optimization that column
    * pruning can defeat — correctness must not depend on it. The truncated
    * lineage means lost blocks fail the job fast instead of a silent
    * nondeterministic recompute (same contract as the neardup-resolve
    * loop's localCheckpoint).
    */
  def rankPerHost(df: DataFrame, orderCols: Seq[Column],
      out: String = "priority"): DataFrame = {
    // explicit numPartitions → REPARTITION_BY_NUM shuffle origin, which AQE
    // never coalesces: __pid must be the un-coalesced partition index
    val numParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(numParts, (col("host") +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // eager: freezes __pid for every consumer
    val offsets = parted.groupBy(col("host"), col("__pid")).count()
      .withColumn("__off", coalesce(
        sum("count").over(Window.partitionBy("host").orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("host").as("__ohost"), col("__pid").as("__opid"), col("__off"))
    val wLocal = Window.partitionBy(col("host"), col("__pid")).orderBy(orderCols: _*)
    // NO broadcast hint on offsets: it is O(hosts) rows, so at 10^8+ small
    // hosts a forced broadcast would OOM the driver. AQE broadcasts it when
    // small; when huge, the shuffle join keys (host,__pid) match the local
    // window's partitioning, so the join's exchange is the window's exchange.
    // Null-safe host equality: a null-host row must keep its rank (the
    // single-window form ranked nulls as their own partition; a plain
    // equi-join would silently drop them from the frontier).
    parted
      .join(offsets, col("host") <=> col("__ohost") && col("__pid") === col("__opid"))
      .withColumn(out, (col("__off") + row_number().over(wLocal)).cast("long"))
      .select((df.columns.map(col) :+ col(out)): _*) // join reordered; keep caller's order
  }

  /** Dequeue ≤ budget(host) rows per host in priority order.
    * `budgets`: df of (host, budget) overrides; hosts absent get
    * `defaultBudget`. No broadcast hint: with per-host crawl-delay
    * overrides this side is O(hosts) — AQE broadcasts it while it is
    * genuinely small and shuffle-joins it at 10^8-host scale (the join key
    * `host` matches the exact-phase window's partitioning anyway).
    */
  def dequeue(pending: DataFrame, budgets: DataFrame, defaultBudget: Int,
      saltCount: Int = 16): DataFrame = {
    val withBudget = pending
      .join(budgets, Seq("host"), "left")
      .withColumn("budget", coalesce(col("budget"), lit(defaultBudget)))
      .withColumn("salt", Hashing.skewSalt(col("urlNorm"), saltCount))
    val w1 = Window.partitionBy("host", "salt").orderBy("priority")
    val w2 = Window.partitionBy("host").orderBy("priority")
    withBudget
      .withColumn("rn1", row_number().over(w1)).where(col("rn1") <= col("budget"))
      .withColumn("rn", row_number().over(w2)).where(col("rn") <= col("budget"))
      .drop("rn1", "rn", "salt", "budget")
  }
}
