package graft.util

/** THE splitmix64 finalizer (Steele/Lea/Flood, public domain — the JDK
  * SplittableRandom mixer): `mix(z) = finalize(z + golden gamma)`.
  *
  * One shared definition on purpose: minhash band hashes (Dedup), the
  * synthetic image pixel pattern + fixture digests (ImageOps), and the
  * sign-LSH hyperplanes that OracleGen re-emits as SQL literals
  * (Similarity) are all pinned — bit-identical — by tests and DuckDB
  * oracles. Three private copies of this function would have to evolve in
  * lockstep; any drift silently desynchronizes them.
  */
object SplitMix64 {
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
