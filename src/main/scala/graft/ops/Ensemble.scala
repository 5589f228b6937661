package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-run ensembling of predicted alignments (SURVEY §2.H1-H3, D6-D7;
  * ref: `Stable Schema Matching/eval/eval_ensemble.py:20-115`).
  *
  * Input long form: (case_id, query_attr, src_attr, tgt_attr, run_id).
  * All modes are single-shuffle groupBy plans — no per-run loops, so N runs
  * at 100 TB cost the same pass as 2 runs.
  */
object Ensemble {

  private val pair = Seq("case_id", "query_attr", "src_attr", "tgt_attr")

  /** H1: distinct union of pairs across runs. */
  def union(preds: DataFrame): DataFrame =
    preds.select(pair.map(col): _*).distinct()

  /** H2: pairs present in ALL runs (count(distinct run) == nRuns). */
  def intersection(preds: DataFrame, nRuns: Int): DataFrame =
    preds.groupBy(pair.map(col): _*)
      .agg(countDistinct(col("run_id")).as("__n"))
      .filter(col("__n") === nRuns)
      .drop("__n")

  /** H3: union − intersection (pairs some but not all runs agree on). */
  def disjoint(preds: DataFrame, nRuns: Int): DataFrame =
    union(preds).except(intersection(preds, nRuns))

  /** D6: per query attribute keep every pair tied at the max vote count
    * (ref: eval_ensemble.py:70-88 keeps the whole argmax tie set).
    */
  def majority(preds: DataFrame): DataFrame = {
    val votes = preds.groupBy(pair.map(col): _*)
      .agg(countDistinct(col("run_id")).as("votes"))
    val w = Window.partitionBy(col("case_id"), col("query_attr"))
    votes.withColumn("__mx", max(col("votes")).over(w))
      .filter(col("votes") === col("__mx"))
      .drop("__mx")
  }

  /** D7: yes/no vote — keep pairs where yes strictly beats no
    * (ref: eval_ensemble.py:92-115). Input adds a `vote` column
    * ('yes'/'no') per run.
    */
  def yesNoMajority(votes: DataFrame): DataFrame =
    votes.groupBy(pair.map(col): _*)
      .agg(
        sum(when(col("vote") === "yes", 1).otherwise(0)).as("__y"),
        sum(when(col("vote") === "no", 1).otherwise(0)).as("__n"))
      .filter(col("__y") > col("__n"))
      .drop("__y", "__n")
}
