package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TWO-PHASE distributed prefix kernel, shared by every "global
  * running <associative op>" site (q149 prefix-sum, q267 global rank,
  * Pareto prefix-max): a naive global window is one task holding the
  * corpus, so instead
  *
  *   (1) [[rangeSplit]] adds a deterministic integer range id `__pid` =
  *       v·ranges div (max+1) — monotone in v, so the global order equals
  *       (__pid, within-range order), with no sampling (reproducible
  *       cross-engine, unlike repartitionByRange's reservoir);
  *   (2) [[bases]] reduces each range to one row and turns the ≤`ranges`
  *       totals into per-range PREFIX values with a tiny window — the op
  *       is a parameter because the algebra only needs associativity
  *       (sum for counts/offsets, max for frontiers);
  *   (3) the caller broadcasts the bases back and finishes each range in
  *       parallel.
  */
object PrefixOps {

  /** Adds `__pid` ∈ [0, ranges) from the value column's own domain.
    * Validates the split's preconditions instead of silently corrupting
    * downstream algebra: values must be non-negative longs (a negative
    * value would land in a negative range id) with ranges·max inside
    * Long. Empty input gets a constant `__pid` (callers then see empty
    * aggregates, not a crash).
    */
  def rangeSplit(df: DataFrame, valueCol: String, ranges: Int): DataFrame = {
    val r = df.agg(max(col(valueCol)), min(col(valueCol))).head()
    if (r.isNullAt(0)) return df.withColumn("__pid", lit(0L))
    val (mx, mn) = (r.getLong(0), r.getLong(1))
    require(mn >= 0, s"rangeSplit($valueCol): negative value $mn — the " +
      "integer range split requires a non-negative domain")
    require(mx <= Long.MaxValue / ranges,
      s"rangeSplit($valueCol): max $mx overflows $ranges-way split")
    df.withColumn("__pid", expr(s"`$valueCol` * $ranges div ${mx + 1}"))
  }

  /** (partCols :+ __pid) → `__base`: the prefix fold of `rangeAgg` over
    * all STRICTLY smaller __pid within the same partCols. `combine` is
    * the same associative op applied across ranges (sum with sum, max
    * with max); `zero` is the empty-prefix identity. The window runs
    * over at most `ranges` rows per part — cluster-trivial by
    * construction.
    */
  def bases(withPid: DataFrame, partCols: Seq[String], rangeAgg: Column,
      combine: Column => Column, zero: Column): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.groupBy((partCols :+ "__pid").map(col): _*)
      .agg(rangeAgg.as("__pt"))
      .withColumn("__base", coalesce(combine(col("__pt")).over(w), zero))
      .select((partCols :+ "__pid" :+ "__base").map(col): _*)
  }
}
