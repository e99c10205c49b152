package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C2/C3/C4 — hash/key derivations as compositions of built-in (codegen'd)
  * functions; no UDFs.
  */
object Hashing {

  /** Python str-whitespace set (`re \s` for str ≡ `str.strip()`'s set),
    * spelled as literal characters so the same class body works in Java
    * regex (Spark), RE2 (the DuckDB oracle), and plain char lookups. Java's
    * bare `\s` is ASCII-only — NBSP/U+2028 pages would hash differently
    * from the reference's Unicode-aware `content_hash`. */
  val PyWs: String = " \t\n\u000b\f\r" +
    "\u001c\u001d\u001e\u001f\u0085\u00a0\u1680" +
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a" +
    "\u2028\u2029\u202f\u205f\u3000"

  /** C3 — content dedup hash: MD5 of (strip → lower → collapse-whitespace)
    * normalized text, Python-whitespace semantics. Reference:
    * `content_hash` `src/scraper/detection.py:36-43`.
    */
  def contentHash(c: Column): Column =
    md5(regexp_replace(
      regexp_replace(lower(c), s"^[$PyWs]+|[$PyWs]+$$", ""),
      s"[$PyWs]+", " "))

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
