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
    // against the seen set anyway (see admitPartitioned)
    seen.select("urlNorm").as[String].rdd.treeAggregate(zero)(
      seqOp = (bf, s) => { if (s != null) bf.putString(s); bf },
      combOp = (a, b) => { a.mergeInPlace(b); a },
      depth = 2)
  }

  /** J1 — exact anti-join admission (authoritative). `candidates` must
    * carry `urlNorm`. */
  def admit(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(seen.select("urlNorm"), Seq("urlNorm"), "left_anti")

  /** Scale-path admission: candidates the Bloom says are definitely-unseen
    * skip the join entirely; only possible-hits join. Equivalent result,
    * far smaller shuffle when the frontier ≫ new links. */
  def admitPartitioned(candidates: DataFrame, seen: DataFrame,
      bloom: Broadcast[BloomFilter]): DataFrame = {
    // null-safe: a null urlNorm is "definitely new" (false) — the exact
    // admit()'s left-anti also passes null keys through (an equi-join
    // never matches null), so the two admission paths stay equivalent
    // instead of the scale path NPE-ing where the exact path succeeds
    val mightContain = udf((s: String) =>
      s != null && bloom.value.mightContainString(s))
    // ONE pass over candidates: the Bloom verdict rides as an EXTRA
    // anti-join condition — a bloom-negative row satisfies it for no seen
    // row, so it passes through unmatched. The earlier two-filter split
    // (definitely-new ∪ confirmed) recomputed the whole candidate lineage
    // AND the probe UDF once per branch; this shape computes both once.
    // (Catalyst cannot push a left-side join-condition conjunct below a
    // left-anti — doing so would drop preserved rows — so the Bloom probe
    // stays in the join.) The seen side's shuffle is identical; only rows
    // the Bloom flags can pair up and the exact anti-join stays the
    // authority on them.
    candidates.join(seen.select(col("urlNorm").as("__seenUrl")),
      col("urlNorm") === col("__seenUrl") && mightContain(col("urlNorm")),
      "left_anti")
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
