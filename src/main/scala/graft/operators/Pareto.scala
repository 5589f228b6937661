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
  * Kernel: [[PrefixOps]] with max as the associative op — a point is on
  * the frontier iff its y strictly exceeds the running max of every point
  * ordered before it under (x asc, y desc). Never an unpartitioned
  * window, O(n log n) after the shuffle vs the oracle's quadratic
  * NOT EXISTS.
  *
  * Preconditions are ENFORCED, not assumed: x is validated by
  * [[PrefixOps.rangeSplit]] (non-negative, overflow headroom) and y ≥ 0
  * here — −1 is the empty-prefix identity, so a negative frontier y would
  * otherwise be dropped silently.
  */
object Pareto {

  def frontier(pts: DataFrame, xCol: String, yCol: String,
      ranges: Int = 8): DataFrame = {
    val ymin = pts.agg(min(col(yCol))).head()
    if (!ymin.isNullAt(0))
      require(ymin.getLong(0) >= 0, s"Pareto.frontier: negative $yCol " +
        s"(${ymin.getLong(0)}) — −1 is the empty-prefix identity, a " +
        "negative frontier y would be dropped silently")
    val withPid = PrefixOps.rangeSplit(pts, xCol, ranges)
    val bases = PrefixOps.bases(withPid, Seq.empty,
      max(col(yCol)), max, lit(-1L))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col(xCol).asc, col(yCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.join(broadcast(bases), Seq("__pid"))
      .withColumn("__prev", greatest(col("__base"),
        coalesce(max(col(yCol)).over(w), lit(-1L))))
      .filter(col(yCol) > col("__prev"))
      .drop("__pid", "__base", "__prev")
  }
}
