package graft

import graft.fixtures.FixtureGen
import graft.functions.ImageOps
import graft.operators.Similarity

/** Generated DuckDB oracle SQL for the queries whose semantics are not
  * hand-writable ANSI SQL (q25-q30). Three techniques, all driver-checkable:
  *
  *  - '''re-expressed math''' (q25/q26/q27/q30): the exact per-row
  *    computation re-derived in DuckDB SQL from shared deterministic
  *    primitives — md5 token hashes, ±1 hyperplanes re-emitted as literals,
  *    HUGEINT modular arithmetic for the 61-bit rolling hash, and an
  *    unrolled Lloyd iteration over 2^-20-quantized exact centroid means.
  *    Float folds are sequential on both sides (the q23/q24 precedent:
  *    DuckDB `list_dot_product`/`list_cosine_similarity` accumulate in
  *    element order, bit-identical to Spark's `aggregate(zip_with)` fold).
  *  - '''independent pure-Scala recomputation''' (q28): the deterministic
  *    200-image fixture is re-encoded/validated sequentially on the driver
  *    and emitted as a VALUES literal — verifying the distributed decode/
  *    validate plumbing against a single-threaded reference pass.
  *  - '''golden-replay transcription''' (q29): the pure-Scala ReferenceSim
  *    (a sequential transcription of the reference crawler's semantics,
  *    `src/crawler/discovery.py:131-230` + `src/jobs/runner.py:781`) is run
  *    on the same fixture and its dispatch order emitted as a VALUES
  *    literal — the driver-checkable form of the golden-replay gate.
  */
object OracleGen {

  /** Java-regex \s equivalent, spelled explicitly for DuckDB's RE2
    * (which lacks \x0B in its \s). */
  private val WsClass = "[ \\t\\n\\x0b\\f\\r]+"

  // ------------------------------------------------------------------
  // q26 — simhash near-dup: per-token md5-derived 64-bit hash, per-bit
  // majority vote, all-pairs hamming <= maxHamming. (Banding in the Spark
  // pipeline is pigeonhole-complete for hamming <= maxHamming, so the
  // band-join output set equals the all-pairs formulation used here.)
  // ------------------------------------------------------------------

  def simhashOracle(augSql: String, maxHamming: Int): String =
    s"""WITH aug AS ($augSql),
       tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '$WsClass')) AS t FROM aug),
       th AS (SELECT doc_id, substr(md5(t), 1, 16) AS h FROM tok),
       bits AS (
         SELECT doc_id, b,
           CASE WHEN sum(CASE WHEN
             ((strpos('0123456789abcdef', substr(h, 16 - (b // 4), 1)) - 1) >> (b % 4)) & 1 = 1
             THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
         FROM th, (SELECT unnest(generate_series(0, 63)) AS b)
         GROUP BY doc_id, b),
       sig AS (
         SELECT doc_id,
           (sum(CASE WHEN b < 63 THEN bit::BIGINT << b ELSE 0 END)
             + CASE WHEN max(CASE WHEN b = 63 THEN bit ELSE 0 END) = 1
                    THEN (-9223372036854775807 - 1) ELSE 0 END)::BIGINT AS sim
         FROM bits GROUP BY doc_id)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              bit_count(xor(a.sim, b.sim)) AS hamming
       FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.sim, b.sim)) <= $maxHamming
       ORDER BY id_a, id_b"""

  // ------------------------------------------------------------------
  // q27 — 61-bit polynomial rolling hash over UTF-8 bytes
  // (graft.functions.RollingHash: h = (h*1000003 + byte + 1) mod 2^61-1),
  // re-expressed with HUGEINT modular arithmetic over hex-decoded bytes.
  // ------------------------------------------------------------------

  def fingerprintOracle: String =
    s"""SELECT doc_id,
         list_reduce(
           list_prepend(0::HUGEINT,
             list_transform(generate_series(1, octet_length(encode(text))),
               i -> (16 * (strpos('0123456789abcdef', substr(lower(hex(encode(text))), 2*i - 1, 1)) - 1)
                     + strpos('0123456789abcdef', substr(lower(hex(encode(text))), 2*i, 1)) - 1)::HUGEINT)),
           (h, b) -> (h * 1000003 + b + 1) % 2305843009213693951)::BIGINT AS fp
       FROM documents ORDER BY doc_id"""

  // ------------------------------------------------------------------
  // q25 / q30 — sign-LSH ANN and IVF ANN
  // ------------------------------------------------------------------

  /** The ±1 hyperplane for plane p as a DuckDB DOUBLE[] literal — the same
    * splitmix64-parity planes Similarity.signBits unrolls into the Spark
    * plan. */
  private def planeLit(p: Int, dim: Int): String =
    (0 until dim).map(d =>
      if (Similarity.planeSign(p, d) > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** Sign-bucket expression over a DOUBLE[] column `v` (bit p set iff the
    * projection onto plane p is >= 0) — mirrors Similarity.signBits. */
  private def bucketExpr(v: String, dim: Int, numPlanes: Int): String =
    (0 until numPlanes).map { p =>
      s"(CASE WHEN list_dot_product($v, ${planeLit(p, dim)}::DOUBLE[]) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def annLshOracle(dim: Int, numPlanes: Int, k: Int, maxQid: Int): String = {
    val probes = ((0 until numPlanes).map(p => 1L << p) :+ 0L).mkString("[", ",", "]")
    s"""WITH cb AS (
         SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                ${bucketExpr("embedding::DOUBLE[]", dim, numPlanes)} AS bucket
         FROM embeddings),
       q AS (SELECT id AS qid, v AS qv, bucket AS qb FROM cb WHERE id < $maxQid),
       qp AS (SELECT qid, qv, xor(qb::BIGINT, p::BIGINT) AS bucket
              FROM q, (SELECT unnest($probes) AS p)),
       cand AS (
         SELECT qp.qid, cb.id, list_cosine_similarity(qp.qv, cb.v) AS cos
         FROM qp JOIN cb ON cb.bucket = qp.bucket AND cb.id <> qp.qid)
       SELECT qid, id, rank FROM (
         SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
         FROM cand)
       WHERE rank <= $k ORDER BY qid, rank"""
  }

  /** Unrolled Lloyd k-means (graft.operators.Ivf.train semantics: init =
    * first k vectors by vec_id; assignment = argmin sequential-fold sqdist,
    * ties to the lower cluster id; update = exact 2^-20-quantized mean;
    * empty clusters keep their previous centroid) + nProbe probe + exact
    * cosine re-rank. */
  def annIvfOracle(dim: Int, k: Int, iters: Int, topK: Int, nProbe: Int,
      maxQid: Int): String = {
    def dist(v: String, c: String): String =
      s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, $dim), " +
        s"i -> ($v[i] - $c[i]) * ($v[i] - $c[i]))), (a, b) -> a + b)"
    val iterCtes = (1 to iters).map { it =>
      val prev = s"c${it - 1}"
      s"""a$it AS (SELECT vec_id, v, cl FROM (
           SELECT vv.vec_id, vv.v, $prev.cl,
             row_number() OVER (PARTITION BY vv.vec_id
               ORDER BY ${dist("vv.v", s"$prev.c")}, $prev.cl) AS rn
           FROM vv, $prev) WHERE rn = 1),
         u$it AS (SELECT cl, pos,
             CAST(sum(CAST(floor(x * 1048576.0) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1048576.0) AS m
           FROM (SELECT cl, pos, v[pos] AS x
                 FROM a$it, (SELECT unnest(generate_series(1, $dim)) AS pos))
           GROUP BY cl, pos),
         n$it AS (SELECT cl, list(m ORDER BY pos) AS c FROM u$it GROUP BY cl),
         c$it AS (SELECT $prev.cl AS cl, coalesce(n$it.c, $prev.c) AS c
                  FROM $prev LEFT JOIN n$it ON $prev.cl = n$it.cl)"""
    }.mkString(",\n")
    val fin = s"c$iters"
    s"""WITH vv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS c
              FROM (SELECT vec_id, v FROM vv ORDER BY vec_id LIMIT $k)),
       $iterCtes,
       asg AS (SELECT vec_id AS id, v, cl FROM (
           SELECT vv.vec_id, vv.v, $fin.cl,
             row_number() OVER (PARTITION BY vv.vec_id
               ORDER BY ${dist("vv.v", s"$fin.c")}, $fin.cl) AS rn
           FROM vv, $fin) WHERE rn = 1),
       prb AS (SELECT qid, qv, cl FROM (
           SELECT vv.vec_id AS qid, vv.v AS qv, $fin.cl,
             row_number() OVER (PARTITION BY vv.vec_id
               ORDER BY ${dist("vv.v", s"$fin.c")}, $fin.cl) AS rn
           FROM vv, $fin WHERE vv.vec_id < $maxQid) WHERE rn <= $nProbe),
       cand AS (
         SELECT prb.qid, asg.id, list_cosine_similarity(prb.qv, asg.v) AS cos
         FROM prb JOIN asg ON prb.cl = asg.cl AND asg.id <> prb.qid)
       SELECT qid, id, rank FROM (
         SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
         FROM cand)
       WHERE rank <= $topK ORDER BY qid, rank"""
  }

  // ------------------------------------------------------------------
  // q28 — image validation expected counts, recomputed sequentially on the
  // driver from the same deterministic fixture (no Spark, no parallelism).
  // ------------------------------------------------------------------

  def imageValidateOracle(count: Long): String = {
    val rows = (0L until count).map { i =>
      val r = FixtureGen.imageRow(i)
      val psnr = ImageOps.psnrVsSynthetic(r.bytes, i, r.w, r.h)
      val valid = if (r.fmt == "png") psnr == 999.0 else psnr >= 40.0
      (r.fmt, valid, r.phash)
    }
    val byFmt = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (fmt, rs) =>
      s"('$fmt', ${rs.size}, ${rs.count(_._2)}, ${rs.map(_._3).distinct.size})"
    }
    // empty VALUES is a DuckDB syntax error, not an empty result — guard
    if (byFmt.isEmpty)
      """SELECT '' AS fmt, 0 AS n, 0 AS n_valid, 0 AS n_phash WHERE 1 = 0"""
    else s"""SELECT fmt, n, n_valid, n_phash
       FROM (VALUES ${byFmt.mkString(", ")}) AS t(fmt, n, n_valid, n_phash)
       ORDER BY fmt"""
  }

  // ------------------------------------------------------------------
  // q29 — expected dispatch order from the pure-Scala reference simulator.
  // ------------------------------------------------------------------

  def crawlOrderOracle(p: FixtureGen.Params, maxDepth: Int): String = {
    val sim = graft.sim.ReferenceSim.crawlAll(p, maxDepth)
    val rows = sim.toSeq.sortBy(_._1).flatMap { case (host, res) =>
      res.order.zipWithIndex.map { case (url, i) =>
        s"('$host', ${i + 1}, '$url', '${res.dispositions(url)}')"
      }
    }
    // empty VALUES is a DuckDB syntax error, not an empty result — guard
    if (rows.isEmpty)
      """SELECT '' AS host, 0 AS priority, '' AS urlNorm, '' AS disposition WHERE 1 = 0"""
    else s"""SELECT host, priority, urlNorm, disposition
       FROM (VALUES ${rows.mkString(", ")}) AS t(host, priority, urlNorm, disposition)
       ORDER BY host, priority"""
  }
}
