package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alignment-quality metrics.
  *
  * Formula semantics follow the reference byte-for-byte
  * (ref: `Stable Schema Matching/eval/eval_utils.py:477-502`,
  * `Schema Mapping/AnalysisUtils/AnaylsisUtils.py:9-28`):
  *   - precision = tp/(tp+fp), 0 when tp+fp == 0
  *   - recall    = tp/(tp+fn), 0 when tp+fn == 0
  *   - f1        = 2pr/(p+r), 0 when p+r == 0
  *   - accuracy2 = (tp+tn)/(tp+tn+fp+fn)
  *   - effort    = (3·fn+fp)/|gold| with |gold| = tp+fn
  *   - the all-zero case (tp=fp=fn=0) counts as perfect (1.0) for p/r/f1
  *     (`AnaylsisUtils.py:11-12`)
  *
  * All expressions are plain Catalyst columns (whole-stage-codegen'd); the
  * float operation structure is kept identical to the DuckDB oracle SQL so
  * IEEE results match bit-for-bit.
  */
object Metrics {

  private val allZero: Column = col("tp") === 0 && col("fp") === 0 && col("fn") === 0

  val precision: Column =
    when(allZero, lit(1.0))
      .when(col("tp") + col("fp") === 0, lit(0.0))
      .otherwise(col("tp") / (col("tp") + col("fp")))

  val recall: Column =
    when(allZero, lit(1.0))
      .when(col("tp") + col("fn") === 0, lit(0.0))
      .otherwise(col("tp") / (col("tp") + col("fn")))

  private val pRaw = when(col("tp") + col("fp") === 0, lit(0.0)).otherwise(col("tp") / (col("tp") + col("fp")))
  private val rRaw = when(col("tp") + col("fn") === 0, lit(0.0)).otherwise(col("tp") / (col("tp") + col("fn")))

  val f1: Column =
    when(allZero, lit(1.0))
      .when(pRaw + rRaw === 0, lit(0.0))
      .otherwise(lit(2) * pRaw * rRaw / (pRaw + rRaw))

  val accuracy2: Column =
    when(col("tp") + col("tn") + col("fp") + col("fn") === 0, lit(0.0))
      .otherwise((col("tp") + col("tn")) / (col("tp") + col("tn") + col("fp") + col("fn")))

  val effort: Column =
    when(col("tp") + col("fn") === 0, lit(0.0))
      .otherwise((lit(3) * col("fn") + col("fp")) / (col("tp") + col("fn")))

  /** The reference's FIRST accuracy definition: (tp+tn)/N with N an
    * external population size (total target columns), distinct from
    * accuracy2's (tp+tn)/(tp+tn+fp+fn) (ref: eval_utils.py:493-496).
    */
  def accuracyOf(n: Column): Column =
    when(n === 0, lit(0.0)).otherwise((col("tp") + col("tn")) / n)

  /** Append the metric columns to a frame that has double columns tp/fp/fn/tn. */
  def withPrfAccuracyEffort(counts: DataFrame): DataFrame =
    counts
      .withColumn("precision", precision)
      .withColumn("recall", recall)
      .withColumn("f1", f1)
      .withColumn("accuracy2", accuracy2)
      .withColumn("effort", effort)

  /** D12 mean reciprocal rank: ranked predictions (query, candidate, rank)
    * joined to gold (query, candidate); rr = 1/min(rank of a gold hit),
    * queries with no hit contribute 0 (ref: eval_utils.py:9-21).
    */
  def meanReciprocalRank(ranked: DataFrame, gold: DataFrame, queryCols: Seq[String]): DataFrame = {
    val qc = queryCols.map(col)
    val hits = ranked.join(gold, queryCols :+ "candidate")
      .groupBy(qc: _*).agg(min(col("rank")).as("first_rank"))
    ranked.select(qc: _*).distinct()
      .join(hits, queryCols, "left")
      .select((qc :+
        coalesce(lit(1.0) / col("first_rank"), lit(0.0)).as("rr")): _*)
      .agg(avg(col("rr")).as("mrr"))
  }

  /** D5 cross-seed 95% normal CI: per-group mean ± 1.96·std/√n over
    * per-seed aggregates (ref: eval_dataset.py:448-475).
    */
  def crossSeedCI(perSeed: DataFrame, dims: Seq[String], metric: String): DataFrame = {
    val g = if (dims.isEmpty) perSeed.groupBy() else perSeed.groupBy(dims.map(col): _*)
    g.agg(
        avg(col(metric)).as("mean"),
        coalesce(stddev_samp(col(metric)), lit(0.0)).as("sd"),
        count(lit(1)).as("n"))
      .withColumn("ci95", lit(1.96) * col("sd") / sqrt(col("n")))
      .drop("sd")
  }

  /** D15 pass-rate: per group, the fraction of rows whose metric is >= 1
    * (perfect), then the max over a config dimension
    * (ref: AnaylsisUtils.py:121-166).
    */
  def passRate(df: DataFrame, groupDims: Seq[String], configDim: String, metric: String): DataFrame = {
    val per = df.groupBy((groupDims :+ configDim).map(col): _*)
      .agg(avg(when(col(metric) >= 1.0, 1.0).otherwise(0.0)).as("pass_rate"))
    per.groupBy(groupDims.map(col): _*)
      .agg(max(col("pass_rate")).as("best_pass_rate"))
  }

  /** D11 token/cost stats: total, mean, and Student-t 95% CI half-width
    * (t-quantile supplied by the caller — driver-side lookup, the engine
    * aggregates; ref: computational_eval.py:11-29).
    */
  def tokenStats(df: DataFrame, tokenCol: String, tQuantile: Double): DataFrame =
    df.agg(
        sum(col(tokenCol)).cast("long").as("total_tokens"),
        avg(col(tokenCol)).as("mean_tokens"),
        coalesce(stddev_samp(col(tokenCol)), lit(0.0)).as("sd"),
        count(lit(1)).as("n"))
      .withColumn("ci95_t", lit(tQuantile) * col("sd") / sqrt(col("n")))
      .drop("sd")
}
