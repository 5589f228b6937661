package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernels for the training-data-pipeline operators (dedup, language
  * ID, quality scoring, fingerprinting). Everything here is a pure Catalyst
  * column expression — codegen-friendly, no UDFs — and has an exact DuckDB
  * SQL mirror so the driver's oracle can hash-match each operator.
  *
  * Portability contract with the oracle (tools/check.py):
  *   - whitespace tokenization = split on a single space, both engines;
  *   - hashes via md5 hex strings (identical output on both engines);
  *   - numeric bit-twiddling stays within 60 bits so BIGINT never overflows.
  */
object TextFunctions {

  /** Whitespace tokens (ref semantics: str.split — InstanceDataHandler.py
    * treats instance data as plain strings; eval_utils.py:239 splits on
    * delimiters).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles from a token array: ["a b c", "b c d", ...].
    * Empty array when the document has fewer than n tokens.
    */
  def wordShingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + (j + 1))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Aggressive normalization for fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace. (ref: stable_match.py:9-24
    * lowercases; eval_utils.py:240-243 strips/replaces before compare).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** MinHash base hash: first 15 hex chars of md5 → 60-bit integer, reduced
    * mod p. ONE md5 per shingle; the 16 "permutations" are cheap affine
    * maps over it (2-universal family) — 16× fewer digests than hashing
    * per-permutation, and pure integer arithmetic the oracle reproduces
    * exactly.
    */
  val minhashP: Long = 1000000007L

  def baseHash(shingle: Column): Column =
    (conv(substring(md5(shingle), 1, 15), 16, 10).cast("long") % minhashP).as("hm")

  /** Affine permutation constants, derived once — shared with the oracle
    * SQL generator so both engines use identical arithmetic.
    *
    * The slopes MUST be mutually unstructured: the original family
    * a_j = c·(j+1) made every h_j(x) = (j+1)·(c·x) + b_j mod p, so the one
    * shingle minimizing (c·x mod p) won EVERY permutation in every doc
    * containing it — two docs sharing just that shingle scored 15/16
    * agreement at exact Jaccard 0.007 (found by `MlCrossCheckSpec`, docs
    * 156/318 at sf0.001) and were falsely merged by q73's components.
    * md5-derived constants have no shared algebraic structure across
    * permutations, restoring the agreement ≈ Jaccard estimate.
    */
  def permConsts(perm: Int): (Long, Long) = {
    def h(tag: String): Long = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-minhash-$tag-$perm".getBytes("UTF-8"))
      digest.take(7).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    ((h("a") % (minhashP - 1)) + 1, h("b") % minhashP)
  }

  /** Seeded, per-permutation MinHash value over a base-hash column. */
  def minhashAgg(hm: Column, perm: Int): Column = {
    val (a, b) = permConsts(perm)
    min((lit(a) * hm + lit(b)) % minhashP)
  }

  /** DuckDB mirror of a `conv(substring(md5(key), 1, n), 16, 10)` prefix
    * hash: n-digit hex→BIGINT polynomial with bit-shift powers (kept
    * integral — a double 16^k sum would lose bits past 2^53). Shared by
    * the minhash/detRand/mock-LLM oracle generators.
    */
  def hexPolySql(nDigits: Int, keyExpr: String): String = {
    val terms = (1 to nDigits).map { k =>
      s"(strpos('0123456789abcdef', substr(md5($keyExpr), $k, 1)) - 1) * (1::BIGINT << ${4 * (nDigits - k)})"
    }.mkString(" + ")
    s"($terms)"
  }

  /** DuckDB mirror of [[baseHash]]. */
  def baseHashSql(shingleExpr: String): String =
    s"(${hexPolySql(15, shingleExpr)} % $minhashP)"

  def minhashAggSql(perm: Int): String = {
    val (a, b) = permConsts(perm)
    s"min(($a * hm + $b) % $minhashP)"
  }

}
