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

  /** Prediction-error classification (ref: `Stable Schema Matching/eval/
    * eval_utils.py:247-307`): each predicted pair (first, second) is checked
    * against source/target schema membership and classified as
    *   - valid        — first ∈ source AND second ∈ target;
    *   - invalid attr — PER SIDE in neither schema (a pair can add 2);
    *   - same schema  — both sides resolve to the same schema (src+src with
    *     second ∉ target, or tgt+tgt with first ∉ source — mutually
    *     exclusive conditions, each +1);
    *   - same attr    — a same-schema pair whose sides are equal.
    * Valid pairs short-circuit (the reference `continue`s before the error
    * checks).
    *
    * `preds`: (case_id, first, second); `schemaCols`: (case_id, col,
    * in_src, in_tgt) — the membership table is schema metadata (small), so
    * it broadcasts and classification is row-local; one shuffle for the
    * per-case counters.
    */
  def errorCategories(preds: DataFrame, schemaCols: DataFrame): DataFrame = {
    // collapse membership to ONE row per (case, col) first: a name present
    // in BOTH schemas (the normal case in schema matching) may arrive as
    // two rows (src + tgt); joining against them raw would fan each
    // prediction out and inflate every counter
    val m1 = schemaCols.groupBy(col("case_id"), col("col"))
      .agg(max(col("in_src")).as("in_src"), max(col("in_tgt")).as("in_tgt"))
    val s1 = broadcast(m1.select(
      col("case_id").as("m1_case"), col("col").as("m1_col"),
      col("in_src").as("f_src"), col("in_tgt").as("f_tgt")))
    val s2 = broadcast(m1.select(
      col("case_id").as("m2_case"), col("col").as("m2_col"),
      col("in_src").as("s_src"), col("in_tgt").as("s_tgt")))
    val m = preds
      .join(s1, col("case_id") === col("m1_case") && col("first") === col("m1_col"), "left")
      .join(s2, col("case_id") === col("m2_case") && col("second") === col("m2_col"), "left")
      .select(col("case_id"), col("first"), col("second"),
        coalesce(col("f_src"), lit(false)).as("f_src"),
        coalesce(col("f_tgt"), lit(false)).as("f_tgt"),
        coalesce(col("s_src"), lit(false)).as("s_src"),
        coalesce(col("s_tgt"), lit(false)).as("s_tgt"))
    val valid = col("f_src") && col("s_tgt")
    val sameSchema = (col("f_src") && col("s_src") && !col("s_tgt")) ||
      (col("f_tgt") && col("s_tgt") && !col("f_src"))
    m.groupBy(col("case_id")).agg(
        sum(when(valid, 1L).otherwise(0L)).as("n_valid"),
        sum(when(!valid,
            when(!col("f_src") && !col("f_tgt"), 1L).otherwise(0L) +
            when(!col("s_src") && !col("s_tgt"), 1L).otherwise(0L))
          .otherwise(0L)).as("n_invalid_attr"),
        sum(when(!valid && sameSchema, 1L).otherwise(0L)).as("n_same_schema"),
        sum(when(!valid && sameSchema && col("first") === col("second"), 1L)
          .otherwise(0L)).as("n_same_attr"))
  }

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

  // sample variance from exact sums: (Σx² − (Σx)²/n)/(n−1), clamped at 0.
  // Unlike stddev_samp's streaming merge (combine-order-dependent in the
  // last ulp), plain sums are exactly associative whenever the metric
  // values are exactly representable (integers, counts, decimal-derived
  // doubles) — so the result is identical under any partitioning AND
  // matches a single-threaded DuckDB oracle bit-for-bit. Per-seed metrics
  // are few and well-scaled, so the textbook cancellation caveat of this
  // formula does not bite here.
  private def varSamp(s: Column, ss: Column, n: Column): Column =
    when(n > 1, greatest((ss - s * s / n) / (n - 1), lit(0.0))).otherwise(lit(0.0))

  /** D5 cross-seed 95% normal CI: per-group mean ± 1.96·std/√n over
    * per-seed aggregates (ref: eval_dataset.py:448-475).
    */
  def crossSeedCI(perSeed: DataFrame, dims: Seq[String], metric: String): DataFrame = {
    val g = if (dims.isEmpty) perSeed.groupBy() else perSeed.groupBy(dims.map(col): _*)
    val m = col(metric).cast("double")
    g.agg(
        sum(m).as("__s"),
        sum(m * m).as("__ss"),
        count(lit(1)).as("n"))
      .withColumn("mean", col("__s") / col("n"))
      .withColumn("ci95",
        lit(1.96) * sqrt(varSamp(col("__s"), col("__ss"), col("n"))) / sqrt(col("n")))
      .select((dims.map(col) :+ col("mean") :+ col("n") :+ col("ci95")): _*)
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
    * aggregates; ref: computational_eval.py:11-29). Exact-sum variance,
    * same rationale as [[crossSeedCI]].
    */
  def tokenStats(df: DataFrame, tokenCol: String, tQuantile: Double): DataFrame = {
    val m = col(tokenCol).cast("double")
    df.agg(
        sum(col(tokenCol)).cast("long").as("total_tokens"),
        sum(m).as("__s"),
        sum(m * m).as("__ss"),
        count(lit(1)).as("n"))
      .withColumn("mean_tokens", col("__s") / col("n"))
      .withColumn("ci95_t",
        lit(tQuantile) * sqrt(varSamp(col("__s"), col("__ss"), col("n"))) / sqrt(col("n")))
      .select(col("total_tokens"), col("mean_tokens"), col("n"), col("ci95_t"))
  }
}
