package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C2/C3/C4 — hash/key derivations as compositions of built-in (codegen'd)
  * functions; no UDFs.
  */
object Hashing {

  /** C3 — content dedup hash: MD5 of (strip → lower → collapse-whitespace)
    * normalized text. Reference: `content_hash` `src/scraper/detection.py:36-43`.
    */
  def contentHash(c: Column): Column =
    md5(regexp_replace(
      regexp_replace(lower(c), "^\\s+|\\s+$", ""),
      "\\s+", " "))

  /** C4 — cache key: first 16 hex chars of SHA-256(url)
    * (`src/scraper/cache.py:43`). */
  def cacheKey(url: Column): Column = substring(sha2(url, 256), 1, 16)

  /** C2 — host bucket for partitioning: pmod(xxhash64(host), n). The same
    * function is the Iceberg `bucket(n, host)` analog used at rest. */
  def hostBucket(host: Column, n: Int): Column = pmod(xxhash64(host), lit(n.toLong))

  /** Skew salt: deterministic per-URL salt within a host's bucket, used for
    * salted repartitioning of skewed domains (north rule). */
  def skewSalt(urlNorm: Column, saltCount: Int): Column =
    pmod(xxhash64(urlNorm), lit(saltCount.toLong))
}
