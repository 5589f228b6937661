package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch composed from EXISTING Spark
  * aggregates — the mergeable cardinality summary next to the repo's
  * Misra-Gries (frequency), KMV/CMS and Bloom sketches, and the
  * auditable twin of `approx_count_distinct` (whose HLL++ registers are
  * an opaque binary). Spark-first on purpose: an HLL register is
  * max-of-rho per bucket, and `groupBy(bucket).agg(max(rho))` IS the
  * mergeable-summary contract (max is associative+commutative, so
  * Spark's partial+final path merges partition sketches map-side with no
  * custom Aggregator, no per-row buffer serialization).
  *
  * Everything is deterministic integer math on an md5-derived 60-bit
  * hash (the `Sampling.detRand` convention), so the full register table
  * is ORACLE-REPLAYABLE: DuckDB rebuilds the registers from the same
  * rows and the q254 gate hash-matches the folded summary, not just a
  * tolerance. Geometry: m = 128 buckets (top 7 hash bits), rho =
  * trailing-zero rank of the remaining 53-bit word (1..53; 54 for word
  * 0 — uniform in distribution, and trailing zeros stay exact in SQL as
  * log2(w & -w) on a power of two). The harmonic denominator is kept
  * EXACT: D = Σ_j 2^(54 − reg_j) ≤ 128·2^54 = 2^61 fits a long, so the
  * only float is the final single-division estimate — bit-identical
  * cross-engine.
  */
object HyperLogLog {

  val P = 7               // bucket bits
  val M: Int = 1 << P     // 128 buckets
  val WordBits = 60 - P   // 53-bit rho word
  val RhoMax: Int = WordBits + 1
  /** Standard bias correction α_m = 0.7213 / (1 + 1.079/m), m ≥ 128. */
  val AlphaSqlExpr = s"(0.7213 / (1.0 + 1.079 / $M.0))"

  /** 60-bit md5 hash of (salt, key cols) — `Sampling.detRand`'s integer
    * core; DuckDB mirror: `TextFunctions.hexPolySql(15, key)`.
    */
  def hash60(salt: String, keys: Column*): Column =
    conv(substring(md5(concat_ws("|", lit(salt) +: keys: _*)), 1, 15), 16, 10)
      .cast("long")

  /** Top-P hash bits → bucket id (0..m−1). */
  def bucketOf(hash: Column): Column = shiftright(hash, WordBits)

  /** Trailing-zero rank of the remaining word: 1..53, 54 for word 0. */
  def rhoOf(hash: Column): Column = {
    val word = hash.bitwiseAND(lit((1L << WordBits) - 1))
    when(word === 0L, lit(RhoMax))
      .otherwise(log2(word.bitwiseAND(-word)).cast("int") + lit(1))
  }

  /** Register table: one row per (groupCols, bkt) with reg = max rho —
    * the whole sketch as a first-class DataFrame (partial+final, one
    * shuffle on (group, bkt)). Absent buckets mean reg = 0.
    */
  def registers(df: DataFrame, groupCols: Seq[String], hash: Column): DataFrame =
    df.select(groupCols.map(col) :+
        bucketOf(hash).as("bkt") :+ rhoOf(hash).as("rho"): _*)
      .groupBy((groupCols :+ "bkt").map(col): _*)
      .agg(max(col("rho")).as("reg"))

  /** Fold a register table to one row per group: empty-bucket count,
    * the EXACT scaled harmonic denominator D = Σ 2^(54−reg) (absent
    * buckets contribute 2^54), register checksum columns, and the raw
    * HLL estimate α·m²·2^54 / D as the single float step.
    */
  def summarize(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val present = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - reg)")).as("d_present"),
        sum(col("reg")).as("reg_sum"),
        max(col("reg")).as("reg_max"))
    present.select(
      groupCols.map(col) ++ Seq(
        (lit(M) - col("n_buckets")).cast("long").as("v_empty"),
        (col("d_present") +
          (lit(M) - col("n_buckets")) * lit(1L << RhoMax)).as("d_scaled"),
        col("reg_sum").cast("long").as("reg_sum"),
        col("reg_max").cast("int").as("reg_max")): _*)
      .withColumn("hll_estimate", estimate(col("d_scaled")))
  }

  /** α·m²·2^54 / D with a pinned evaluation order (mirrored verbatim in
    * SQL by [[estimateSql]]).
    */
  def estimate(dScaled: Column): Column =
    (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble)) *
      lit((M.toLong * M.toLong).toDouble) * lit((1L << RhoMax).toDouble)) /
      dScaled.cast("double")

  def estimateSql(dExpr: String): String =
    s"($AlphaSqlExpr * ${M.toLong * M.toLong}.0 * ${1L << RhoMax}.0) " +
      s"/ CAST($dExpr AS DOUBLE)"
}
