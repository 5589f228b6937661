package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: for each left row, attach the right row
  * with the greatest right.ts <= left.ts within the same key — the
  * feature-alignment primitive of a training-data pipeline (join events to
  * the latest snapshot/label/price at event time). The reference engine has
  * no temporal-join analogue (its joins are equi-joins over id columns,
  * e.g. `eval/eval_utils.py` gold↔pred merges); this is the Spark-native
  * extension of that family.
  *
  * Implementation: tag both sides, union, ONE shuffle on the key, and an
  * in-partition sort by (ts, tag) — right rows sort before left rows at
  * equal ts, so the match is inclusive. A running `last(payload,
  * ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT fills each left row
  * with the latest right payload seen. Left rows with no prior right row
  * keep NULL payloads (left-outer semantics).
  *
  * Scale: no range-join explosion (a naive `l.ts >= r.ts` theta-join is
  * O(|L|·|R|) per key) and no broadcast requirement — cost is one hash
  * exchange plus a per-partition sort, the same budget as sessionization.
  * Skewed keys split via AQE; the window state is the sort buffer only.
  */
object AsOfJoin {

  /** Right side must be unique per (key, ts): pre-aggregate if it is not —
    * `last()` over duplicate (ts, tag) rows has no deterministic winner.
    * Right payload columns (everything except key + ts) are emitted with
    * `prefix`; the right event time is emitted as `prefix + tsCol`.
    */
  def asOf(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, prefix: String = "r_"): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val rightPayload = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val lSide = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__tag")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(lTypes(tsCol)).as(s"$prefix$tsCol")) ++
        rightPayload.map(c => lit(null).cast(rTypes(c)).as(s"$prefix$c")): _*)
    val rSide = right.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        Seq(col(tsCol).as(s"$prefix$tsCol")) ++
        rightPayload.map(c => col(c).as(s"$prefix$c")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (s"$prefix$tsCol" +: rightPayload.map(c => s"$prefix$c"))
      .foldLeft(lSide.unionByName(rSide)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    filled.filter(col("__tag") === 1).drop("__tag")
  }
}
