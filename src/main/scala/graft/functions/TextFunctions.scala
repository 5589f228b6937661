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

  /** Seeded, per-permutation MinHash value: min over the doc's shingle set
    * of md5(perm-salt || shingle). String min = lexicographic on lowercase
    * hex — identical ordering on both engines.
    */
  def minhashAgg(shingle: Column, perm: Int): Column =
    min(md5(concat(lit(s"$perm|"), shingle)))

  /** LSH band key: hash of the band's concatenated minhash values. */
  def bandKey(minhashes: Seq[Column]): Column =
    md5(concat_ws("", minhashes: _*))
}
