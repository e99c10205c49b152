package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[cosine]]        — pure column expression (zip_with + aggregate),
  *                        double precision, sequential summation (matches
  *                        the DuckDB oracle bit-for-bit)
  *  - [[bruteForceTopK]] — exact baseline: broadcast the query set, scan
  *                        the corpus once, per-query top-k via window
  *  - [[lshTopK]]       — scale path: sign-LSH bucket candidates (multi-
  *                        probe within hamming-1 of the query bucket),
  *                        exact re-rank inside buckets
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * ±1 from splitmix64 parity — cheap, seedable, identical everywhere.
    * private[graft]: OracleGen re-emits the same planes as SQL literals. */
  private[graft] def planeSign(p: Int, d: Int): Double =
    if ((graft.util.SplitMix64.mix(p.toLong << 32 | d.toLong) & 1L) == 0L) 1.0 else -1.0

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity via the higher-order column functions — kept as the
    * SQL-surface illustration and as the equality witness for [[cosine]]'s
    * codegen expression (the fold order is identical by construction). */
  def cosineColumnar(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>"); val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Cosine similarity in double precision (cast float arrays first) —
    * native codegen'd expression (graft.functions.CosineSim): the
    * higher-order formulation is CodegenFallback and allocated a product
    * array per row in every ANN re-rank / near-dup verify. Bit-identical
    * fold (same element-order sums), so the DuckDB oracles are unaffected.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.vectorfns.cosine_sim(
      a.cast("array<double>"), b.cast("array<double>"))

  /** Sign-LSH bucket id: numPlanes sign bits of ±1-hyperplane projections.
    * Pure column expression — the planes unroll into the plan as literals
    * (numPlanes × dim is small). */
  def signBits(vec: Column, dim: Int, numPlanes: Int): Column =
    signBitsRange(vec, dim, 0, numPlanes)

  /** Sign bits over a plane range [planeStart, planeStart+planeCount) —
    * lets callers derive several INDEPENDENT band keys from disjoint plane
    * sets (OR-amplified LSH, mirroring the minhash banding). */
  def signBitsRange(vec: Column, dim: Int, planeStart: Int, planeCount: Int): Column = {
    val v = vec.cast("array<double>")
    val bits: Seq[Column] = (0 until planeCount).map { p =>
      val proj = (0 until dim).map { d =>
        // try_element_at: a shorter-than-dim vector yields NULL (bit 0)
        // instead of INVALID_ARRAY_INDEX under ANSI mode (Spark 4 default)
        // — one malformed row must not kill the job; callers filter
        // degenerate rows before banding (see degenerateFilter)
        try_element_at(v, lit(d + 1)) * lit(planeSign(planeStart + p, d))
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** [[signBitsRange]] as a plain fold — BIT-IDENTICAL to the column form
    * (same sequential d-ascending IEEE sum per plane, same >= 0 sign test;
    * the same equivalence [[Dedup.signBandKeys]] documents and its spec
    * asserts). The column form unrolls numPlanes × dim try_element_at
    * terms into the plan — at 64 dims × 12 planes that is a 768-term tree
    * Catalyst must analyze and Janino must compile PER QUERY, which
    * dominated q25's wall time (guide §1.2: per-task work AND plan cost).
    * A null/short vector yields 0L exactly like the column form (null
    * proj → every when() falls to otherwise(0)); callers filter those
    * rows out via [[wellFormed]] either way. */
  private[graft] def signKey(v: Seq[Double], dim: Int, planeStart: Int,
      planeCount: Int): Long = {
    if (v == null || v.length < dim) return 0L
    var key = 0L
    var p = 0
    while (p < planeCount) {
      var s = 0.0
      var d = 0
      while (d < dim) { s += v(d) * planeSign(planeStart + p, d); d += 1 }
      if (s >= 0) key |= (1L << p)
      p += 1
    }
    key
  }

  /** Rows a cosine-space operator can say nothing about: null, wrong
    * length, or zero norm (cosine = 0/0 = NaN, which Spark orders ABOVE
    * every real value — an unguarded zero vector would rank #1 for every
    * query). Applied to the corpus side of the top-k operators. */
  private[operators] def wellFormed(vec: Column, dim: Int): Column =
    vec.isNotNull && size(vec) === dim &&
      aggregate(vec.cast("array<double>"), lit(0.0),
        (acc, x) => acc + x * x) > 0.0

  /** Exact brute-force top-k neighbors for each query row.
    * queries is expected to be small (broadcast); corpus is scanned once.
    * Returns (qid, id, cos, rank ≤ k); self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      /** pass the embedding dim to ALSO reject wrong-length rows (a short
        * vector would silently cosine over the common prefix — a
        * plausible-but-wrong score in the exact baseline the ANN paths
        * are validated against). */
      dim: Option[Int] = None): DataFrame = {
    // zero-norm / null rows are droppable, not rankable: their cosine is
    // NaN, and Spark sorts NaN above every real value, so one degenerate
    // row would otherwise be every query's rank-1 neighbor — and a
    // degenerate QUERY would rank k arbitrary corpus rows
    def usable(v: Column): Column = dim match {
      case Some(d) => wellFormed(v, d)
      case None => v.isNotNull &&
        aggregate(v.cast("array<double>"), lit(0.0), (acc, x) => acc + x * x) > 0.0
    }
    val c = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .where(usable(col("v")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .where(usable(col("qv")))
    val scored = c.join(broadcast(q), col("id") =!= col("qid"))
      // cross-shape by construction: brute force IS the full scan baseline
      .withColumn("cos", cosine(col("qv"), col("v")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("id"))))
      .where(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }

  /** ANN top-k: candidates = corpus rows whose LSH bucket is within
    * hamming-1 of the query's bucket (multi-probe), exact cosine re-rank.
    * Trades recall for touching ~ (numPlanes+1)/2^numPlanes of the corpus
    * per query — the 100 TB path where brute force is a full scan per
    * query batch. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, numPlanes: Int = 12,
      /** false → shuffled equi-join on the bucket key instead of a
        * broadcast of the probe set: the scale path when the query set
        * exceeds broadcast size (verdict: the 100 TB story needs both
        * sides shuffled; same results, different physical plan). */
      broadcastQueries: Boolean = true): DataFrame = {
    // bucket keys via the UDF fold, not the unrolled column expression:
    // same bits (see signKey), ~6× less plan/codegen work per query
    val keyUdf = udf((v: Seq[Double]) => signKey(v, dim, 0, numPlanes))
    val c = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .where(wellFormed(col("v"), dim)) // NaN-cosine / short-vector guard
      .withColumn("bucket", keyUdf(col("v").cast("array<double>")))
    val probes = (0 until numPlanes).map(p => lit(1L << p)) :+ lit(0L)
    val q0 = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .where(wellFormed(col("qv"), dim)) // degenerate queries rank on NaN
      .withColumn("qbucket", keyUdf(col("qv").cast("array<double>")))
      .withColumn("probe", explode(array(probes: _*)))
      .withColumn("bucket", col("qbucket").bitwiseXOR(col("probe")))
      .select("qid", "qv", "bucket")
    val qSide = if (broadcastQueries) broadcast(q0) else q0
    c.join(qSide, Seq("bucket"))
      .where(col("id") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("id"))))
      .where(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }
}
