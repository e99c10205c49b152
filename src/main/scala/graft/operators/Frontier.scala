package graft.operators

import org.apache.spark.sql.DataFrame
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
    * `runner.py:781` — W1). */
  def prioritize(pending: DataFrame): DataFrame =
    pending.withColumn("priority",
      row_number().over(Window.partitionBy("host").orderBy("urlNorm")).cast("long"))

  /** Dequeue ≤ budget(host) rows per host in priority order.
    * `budgets`: small df (host, budget); hosts absent get `defaultBudget`.
    */
  def dequeue(pending: DataFrame, budgets: DataFrame, defaultBudget: Int,
      saltCount: Int = 16): DataFrame = {
    val withBudget = pending
      .join(broadcast(budgets), Seq("host"), "left")
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
