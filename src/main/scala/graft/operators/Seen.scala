package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** D2/A5/J1 — the URL-seen set: broadcast Bloom probe + exact anti-join.
  *
  * The Bloom filter is rebuilt per epoch via `treeAggregate` (north rule)
  * and only PRUNES candidate links before the authoritative anti-join —
  * Bloom has no false negatives, so `prune ∘ confirm ≡ confirm`; the probe
  * just keeps the shuffled side small at 10^10 scale. Reference analog:
  * `norm not in visited` (`src/crawler/discovery.py:188,221`).
  */
object Seen {

  /** Build the seen-set Bloom via treeAggregate (depth 2 avoids a driver
    * merge fan-in at scale; the single sanctioned RDD use, SURVEY §4.2). */
  def buildBloom(seen: DataFrame, expectedItems: Long, fpp: Double): BloomFilter = {
    val spark = seen.sparkSession
    import spark.implicits._
    val zero = BloomFilter.create(math.max(64L, expectedItems), fpp)
    // null keys skipped: putString NPEs, and a null can never equi-join
    // against the seen set anyway (see admitAtScale)
    seen.select("urlNorm").as[String].rdd.treeAggregate(zero)(
      seqOp = (bf, s) => { if (s != null) bf.putString(s); bf },
      combOp = (a, b) => { a.mergeInPlace(b); a },
      depth = 2)
  }

  /** J1 — exact anti-join admission (authoritative). `candidates` must
    * carry `urlNorm`. */
  def admit(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(seen.select("urlNorm"), Seq("urlNorm"), "left_anti")

  /** Scale-path admission of a candidate level against a HUGE seen set —
    * the 10^10-URL shape, selected by the engine when `seen` exceeds
    * broadcast size (below that, the plain [[admit]] broadcasts under AQE
    * and no Bloom can improve it). Two Blooms, each doing real work:
    *
    *  1. the carried SEEN-set Bloom routes candidates: definitely-unseen
    *     rows (Bloom has no false negatives) bypass the join entirely, so
    *     only bloom-positive candidates reach the confirm join's shuffle;
    *  2. a per-epoch CANDIDATE Bloom — built over the positives via
    *     treeAggregate, an O(|level|) job at the delta scale, never
    *     O(|seen|) — prunes the seen side BEFORE its exchange: seen is
    *     scanned once and only rows that can possibly equal a candidate
    *     are shuffled. Both sides of the exact confirm join then move
    *     O(|level|) rows instead of the seen side shuffling O(|seen|).
    *
    * Spark cannot derive shape 2 itself: `InjectRuntimeFilter`'s
    * `canPruneRight` covers Inner/LeftSemi/LeftOuter only, so a LeftAnti's
    * build side is never runtime-bloom-filtered (verified against the
    * 4.1.2 catalyst jar) — even though pruning it with a left-side Bloom
    * is safe (a seen row matching no candidate cannot change the anti
    * result).
    *
    * `admitAtScale ≡ admit`: the exact anti-join stays the authority on
    * every bloom-positive row; Bloom false positives only add confirm rows
    * (shape 1) or retained seen rows (shape 2), never change the result.
    * Null-urlNorm candidates route to the bypass branch — the same
    * pass-through that `admit`'s null-never-equi-matches gives, so the
    * paths stay equivalent instead of this one NPE-ing in `putString`.
    *
    * Candidates' lineage is evaluated three times (two route filters + the
    * Bloom build): callers hand in a committed-table read (the engine's
    * `level_next`) or a cached frame, never an expensive recompute.
    *
    * `expectedCandidates` sizes the candidate Bloom. Undersizing only
    * degrades the prune ratio (correctness is the exact join's);
    * oversizing only costs broadcast bytes — a rough upper bound is fine.
    *
    * `onCandBloom` hands the caller the per-call candidate-Bloom broadcast
    * so it can be unpersisted once the returned plan's actions are done —
    * at the design scale it is ~|level| bits per epoch, and leaving it to
    * the GC-driven ContextCleaner accumulates epochs of Blooms on the
    * driver and executors (the engine unpersists it next epoch, exactly
    * like the carried seen-Bloom broadcast).
    */
  def admitAtScale(candidates: DataFrame, seen: DataFrame,
      bloom: Broadcast[BloomFilter], expectedCandidates: Long,
      fpp: Double,
      onCandBloom: Broadcast[BloomFilter] => Unit = _ => ()): DataFrame = {
    val spark = candidates.sparkSession
    val mightContain = udf((s: String) =>
      s != null && bloom.value.mightContainString(s))
    val pos = candidates.where(mightContain(col("urlNorm")))
    val neg = candidates.where(!mightContain(col("urlNorm")))
    val candBloom = spark.sparkContext.broadcast(
      buildBloom(pos, expectedCandidates, fpp)) // buildBloom floors at 64
    onCandBloom(candBloom)
    val prune = udf((s: String) =>
      s != null && candBloom.value.mightContainString(s))
    val confirmed = pos.join(
      seen.select("urlNorm").where(prune(col("urlNorm"))),
      Seq("urlNorm"), "left_anti")
    neg.unionByName(confirmed)
  }

  /** Anti-join shaped for a TINY left against a HUGE right: a plain
    * left-anti would shuffle the full right side (Spark can only broadcast
    * the BUILD/right side of an anti-join, and the right side is the big
    * one here). Instead: semi-join the right against the broadcast left
    * (one scan of the right, no shuffle), then subtract the ≤|left|
    * matches from the left with a second broadcast. Identical result. */
  def antiJoinTinyLeft(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val matches = right
      .join(broadcast(left.select(keyCols: _*).distinct()), keys, "left_semi")
      .select(keyCols: _*).distinct()
    left.join(broadcast(matches), keys, "left_anti")
  }
}
