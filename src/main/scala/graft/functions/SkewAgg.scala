package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-tolerant aggregation: two-stage salted combine for algebraic
  * aggregates. At 100 TB a hot key (one language, one boilerplate
  * fingerprint) funnels its whole group through a single reducer; salting
  * spreads the partial aggregation over `buckets` tasks and the final
  * stage combines `buckets` rows per key instead of billions.
  *
  * Only algebraic aggregates compose across stages — counts and sums here
  * (avg = sum/count at the end). AQE's skew-join handling covers JOIN skew;
  * this covers GROUP BY skew, which AQE does not re-balance.
  */
object SkewAgg {

  /** count per key, salted. Identical result to `groupBy(key).count()`. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], buckets: Int = 64): DataFrame = {
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("count"))
  }

  /** sum of a column per key, salted (exact for integral/decimal types;
    * for doubles the result is a sum in SOME order, as any parallel sum is).
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      buckets: Int = 64): DataFrame = {
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join for a SKEWED big side against a small side: the big
    * side's hot keys are spread over `buckets` sub-keys (salt derived from
    * the row, any expression — it only affects placement, never the
    * result), and the small side is replicated ×buckets so every
    * (key, salt) bucket finds its match. Result is exactly
    * `big.join(small, keyCols)`; the shuffle just stops funneling a hot
    * key through one reducer.
    *
    * Use when the small side is too big to broadcast but small enough to
    * replicate ×buckets, and AQE's skew-join split is unavailable (e.g.
    * the exchange is reused by another consumer) or insufficient. Inner
    * join semantics; rows with NULL key join nothing, as in a plain join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      saltSource: org.apache.spark.sql.Column, buckets: Int = 16): DataFrame = {
    // coalesce: a NULL saltSource must still land in SOME bucket — a NULL
    // salt would silently drop the row from the inner join on __salt,
    // breaking the "salt never affects the result" contract
    val b = big.withColumn("__salt",
      coalesce(pmod(saltSource, lit(buckets)).cast("int"), lit(0)))
    val s = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i)): _*)))
    b.join(s, keyCols :+ "__salt").drop("__salt")
  }
}
