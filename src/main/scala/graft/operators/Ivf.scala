package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to sign-LSH: a coarse quantizer (k-means over the corpus, trained
  * with DataFrame aggregations only) partitions vectors into k lists; a
  * query probes the `nProbe` nearest lists and exact-reranks inside them.
  *
  * Deterministic end to end: initialization takes the first k vectors in
  * vec_id order; assignment ties break on the lower centroid id; iteration
  * count is fixed (no convergence-by-epsilon wall-clock dependence).
  *
  * Scale shape: training is `iters` passes of (assign → posexplode →
  * groupBy(cluster, dim) avg) — all hash aggregations; the index assign is
  * one narrow pass; queries touch ~nProbe/k of the corpus.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def sqDist(a: Seq[Double], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { val d = a(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Nearest-centroid id (ties → lower id) as a UDF over a broadcast model. */
  private def assignUdf(model: Model) =
    udf { (v: Seq[Double]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < model.centroids.length) {
        val d = sqDist(v, model.centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

  /** Quantization scale for exact centroid averaging: coordinates are
    * floored to a 2^-20 grid and summed as longs, so the mean is an exact
    * integer ratio — identical bits regardless of partition count, shuffle
    * order, or engine (the DuckDB oracle computes the same ratio). A
    * float-double `avg` would drift in the last bits with summation order. */
  final val QuantScale: Double = 1048576.0 // 2^20

  /** Train the coarse quantizer. `corpus` needs (vec_id, embedding). */
  def train(corpus: DataFrame, dim: Int, k: Int, iters: Int = 3): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // same degenerate-row guard as topK (Similarity.wellFormed): a null/
    // wrong-length row would NPE or misindex inside the assign UDF, a
    // null ELEMENT unboxes to 0.0 in assign but is skipped by the sum
    // while count still counts the row (biasing that centroid), and a NaN
    // element sends every row to cluster 0 — train must not learn from
    // rows topK will never serve anyway
    val vecs = corpus.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .where(Similarity.wellFormed($"v", dim))
      // the corpus lineage feeds init + one assign→agg job per Lloyd
      // iteration; at the 100 TB scale path that is the dominant scan —
      // pay it once
      .persist()
    val init = vecs.orderBy("vec_id").limit(k).select("v")
      .as[Seq[Double]].collect().map(_.toArray)
    var model = Model(init)
    (1 to iters).foreach { _ =>
      val assigned = vecs.withColumn("cluster", assignUdf(model)($"v"))
      val sums = assigned
        .select($"cluster", posexplode($"v").as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(floor($"x" * QuantScale).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .as[(Int, Int, Long, Long)].collect()
      val next = model.centroids.map(_.clone())
      sums.foreach { case (c, p, sq, n) => next(c)(p) = sq.toDouble / (n.toDouble * QuantScale) }
      model = Model(next)
    }
    vecs.unpersist()
    model
  }

  /** ANN top-k: probe the `nProbe` nearest lists, exact cosine re-rank.
    * Returns (qid, id, cos, rank). */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, nProbe: Int,
      /** false → shuffled equi-join on the cluster key (scale path for
        * query sets beyond broadcast size); identical results. */
      broadcastQueries: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val probesUdf = udf { (v: Seq[Double]) =>
      model.centroids.zipWithIndex
        .map { case (c, i) => (sqDist(v, c), i) }
        .sortBy(t => (t._1, t._2)).take(nProbe).map(_._2)
    }
    // one shared degenerate-row guard (Similarity.wellFormed) on BOTH
    // sides: a null/truncated vector would NPE or misindex inside the
    // assign/probe UDFs, and a zero-norm one ranks arbitrary rows first
    // on NaN cosine
    val dim = model.centroids.headOption.map(_.length).getOrElse(0)
    val indexed = corpus
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      .where(Similarity.wellFormed($"v", dim))
      .withColumn("cluster", assignUdf(model)($"v"))
    val q0 = queries
      .select($"vec_id".as("qid"), $"embedding".cast("array<double>").as("qv"))
      .where(Similarity.wellFormed($"qv", dim))
      .withColumn("cluster", explode(probesUdf($"qv")))
    val q = if (broadcastQueries) broadcast(q0) else q0
    indexed.join(q, Seq("cluster"))
      .where($"id" =!= $"qid")
      .withColumn("cos", Similarity.cosine($"qv", $"v"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), $"id")))
      .where($"rank" <= k)
      .select("qid", "id", "cos", "rank")
  }
}
