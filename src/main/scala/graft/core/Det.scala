package graft.core

/** Deterministic driver-side hashing for seeded METADATA shuffles
  * (`Readers.shuffleCase`, `SchemaXml.groupClusters`): ordering elements by
  * the md5 of a '|'-joined key makes the "random" permutation a pure
  * function of (seed, element identity) that the DuckDB oracle replays
  * verbatim with `ORDER BY md5(concat_ws('|', ...))` — unlike JVM
  * `Random.shuffle`, which no other engine can reproduce. Same rationale as
  * the distributed `Sampling.detRand` (md5, not xxhash64: both engines
  * must compute the identical draw).
  */
object Det {
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
