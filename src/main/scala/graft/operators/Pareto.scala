package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the points no other point strictly beats
  * with x minimized and y maximized — dominance(b over a) ⇔ b.x ≤ a.x ∧
  * b.y ≥ a.y ∧ (b.x < a.x ∨ b.y > a.y). Input must be DISTINCT (x, y)
  * points (equal points never dominate each other; fold multiplicity into
  * a payload column first).
  *
  * Kernel: the q149 TWO-PHASE prefix pattern with max as the associative
  * op — a point is on the frontier iff its y strictly exceeds the running
  * max of every point ordered before it under (x asc, y desc). Phase 1
  * splits on a deterministic integer range of x (monotone ⇒ the split
  * respects the global order), phase 2 reduces each range to one max,
  * phase 3 turns the `ranges` totals into base maxima with a
  * ranges-row window, phase 4 broadcasts bases back and each range scans
  * its slice in parallel — never an unpartitioned window, O(n log n)
  * after the shuffle vs the oracle's quadratic NOT EXISTS.
  *
  * Requires x ≥ 0 (integer range split) and y ≥ 0 (−1 is the identity
  * element used for the empty prefix).
  */
object Pareto {

  def frontier(pts: DataFrame, xCol: String, yCol: String,
      ranges: Int = 8): DataFrame = {
    val withPid = pts
      .join(broadcast(pts.agg(max(col(xCol)).as("__mx"))))
      .withColumn("__pid", expr(s"$xCol * $ranges div (__mx + 1)"))
    val bases = withPid.groupBy(col("__pid")).agg(max(col(yCol)).as("__pm"))
      .withColumn("__base", coalesce(max(col("__pm")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(-1L)))
      .select(col("__pid"), col("__base"))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col(xCol).asc, col(yCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.join(broadcast(bases), Seq("__pid"))
      .withColumn("__prev", greatest(col("__base"),
        coalesce(max(col(yCol)).over(w), lit(-1L))))
      .filter(col(yCol) > col("__prev"))
      .drop("__pid", "__mx", "__base", "__prev")
  }
}
