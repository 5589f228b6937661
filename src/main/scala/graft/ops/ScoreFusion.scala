package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dual-direction score fusion + confidence-score post-processing
  * (SURVEY §2.C4 and §7.4.5).
  */
object ScoreFusion {

  sealed trait Combine
  case object Multiply extends Combine
  case object Average extends Combine

  /** C4 avg-logits fusion (ref: `ask_StableMatcher.py:131-226`
    * `save_avg_logits`): full-outer merge of forward (swap_F) and backward
    * (swap_T) preference scores on (case, src, tgt); missing side
    * contributes 0; pairs whose combined score is 0 are dropped
    * (`:159-168`).
    *
    * Inputs long-form: (case_id, src_attr, tgt_attr, score).
    */
  def avgLogits(fwd: DataFrame, bwd: DataFrame, mode: Combine): DataFrame = {
    val keys = Seq("case_id", "src_attr", "tgt_attr")
    val f = fwd.withColumnRenamed("score", "fwd_score")
    val b = bwd.withColumnRenamed("score", "bwd_score")
    val joined = f.join(b, keys, "full_outer")
      .withColumn("fwd_score", coalesce(col("fwd_score"), lit(0.0)))
      .withColumn("bwd_score", coalesce(col("bwd_score"), lit(0.0)))
    val combined = mode match {
      case Multiply => col("fwd_score") * col("bwd_score")
      case Average  => (col("fwd_score") + col("bwd_score")) / 2.0
    }
    joined.withColumn("score", combined).filter(col("score") =!= 0.0)
      .select((keys.map(col) :+ col("fwd_score") :+ col("bwd_score") :+ col("score")): _*)
  }

  /** Contract of the reference's MISSING `postprocess_confidence_scores.py`
    * (invoked at `ask_StableMatcher.py:56-62` but absent from the repo) —
    * reimplemented from its observable output shape
    * (`filtered_preferences` with [option, score] lists; score_0/score_100
    * sentinel fields, `ask_StableMatcher.py:88-96`,
    * `eval_confidence_score.py:172-199`):
    *   - raw 0-100 integer confidences normalized to [0,1];
    *   - the no-match sentinel's score is TRACKED (score_0/score_100
    *     columns) and the sentinel removed from the preference list;
    *   - options scoring 0 are dropped;
    *   - remaining candidates sorted score-desc (tie: name asc).
    *
    * Input long form: (case_id, query_attr, cand_attr, raw_score 0-100).
    * Output adds is_sentinel flags aggregated per query.
    */
  def postprocessConfidence(
      scores: DataFrame,
      sentinels: Set[String] = Set("none of the options", "there is no match.")): DataFrame = {
    val isSent = lower(trim(col("cand_attr"))).isin(sentinels.toSeq: _*)
    val norm = scores
      .withColumn("score",
        (least(greatest(col("raw_score").cast("double"), lit(0.0)), lit(100.0)) / 100.0))
      .withColumn("is_sentinel", isSent)
    val sentinelStats = norm.filter(col("is_sentinel"))
      .groupBy(col("case_id"), col("query_attr"))
      .agg(
        max(when(col("score") === 0.0, 1).otherwise(0)).as("score_0"),
        max(when(col("score") === 1.0, 1).otherwise(0)).as("score_100"))
    norm.filter(!col("is_sentinel") && col("score") > 0.0)
      .join(sentinelStats, Seq("case_id", "query_attr"), "left")
      .withColumn("score_0", coalesce(col("score_0"), lit(0)))
      .withColumn("score_100", coalesce(col("score_100"), lit(0)))
      .select(col("case_id"), col("query_attr"), col("cand_attr"),
        col("score"), col("score_0"), col("score_100"))
  }

  /** Case-id categorizer (ref: `eval/eval_dataset.py:31-96`): id encodes
    * `db:table|db:table` → (src_db, src_table, tgt_db, tgt_table) dims for
    * grouped aggregates.
    */
  def caseDims(df: DataFrame, idCol: String = "case_id"): DataFrame = {
    val parts = split(col(idCol), "\\|")
    def side(i: Int) = split(element_at(parts, i), ":")
    df.withColumn("src_db", element_at(side(1), 1))
      .withColumn("src_table", element_at(side(1), 2))
      .withColumn("tgt_db", element_at(side(2), 1))
      .withColumn("tgt_table", element_at(side(2), 2))
  }
}
