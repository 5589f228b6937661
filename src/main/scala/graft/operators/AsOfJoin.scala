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
  * equal ts, so the match is inclusive. The right row rides as ONE struct
  * column and a running `last(struct, ignoreNulls)` over rows UNBOUNDED
  * PRECEDING..CURRENT fills each left row — the struct is non-null
  * whenever a right row exists, so a genuinely NULL right payload VALUE is
  * carried through intact (a per-column fill would skip it and mix fields
  * from different right rows). Left rows with no prior right row keep NULL
  * payloads (left-outer semantics). Rows with a NULL key value match
  * nothing, exactly like an equi-join — right null-key rows are dropped up
  * front, left ones fall through with NULL payloads.
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
    require(!rightPayload.contains("__ts"), "right payload column named __ts")

    // the whole right row as one struct: its nullness marks "a right row
    // exists here", independent of the nullness of any payload value
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__ts", rTypes(tsCol)) +:
        rightPayload.map(c => org.apache.spark.sql.types.StructField(c, rTypes(c))))
    val keysNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)

    val lSide = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__tag")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(rStructType).as("__r")): _*)
    val rSide = right.filter(keysNotNull).select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        Seq(struct(col(tsCol).as("__ts") +: rightPayload.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        keyCols.map(col) ++ Seq(col(tsCol)) ++ leftPayload.map(col) ++
          Seq(col("__r.__ts").as(s"$prefix$tsCol")) ++
          rightPayload.map(c => col(s"__r.$c").as(s"$prefix$c")): _*)
  }
}
