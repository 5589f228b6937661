package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed ORDER STATISTIC without a global sort — the
  * selection-by-histogram kernel. Spark's exact `percentile` aggregate
  * buffers and sorts every group's values on one reducer; at corpus scale
  * the exact k-th needs the two-phase alternative:
  *
  *   phase 1: one scan builds a per-(group, bucket) histogram over the
  *            integer value domain (bucket = v div w, `buckets` knob);
  *            the driver folds the ≤ groups·buckets counts into a running
  *            rank and finds the bucket holding each group's k-th;
  *   phase 2: one scan counts exact values inside only the target buckets
  *            (pushdown-friendly semi-filter); the driver walks the
  *            ≤ groups·(domain/buckets) distinct-value counts to the
  *            answer.
  *
  * Two DATA scans plus a max() sizing pass for the bucket width (skip it
  * by passing `maxValue` when the domain is known — e.g. from table
  * statistics or a fixed-point encoding's range); the driver only ever
  * touches aggregate tables whose size is set by the `buckets` knob —
  * never rows. Requires a non-negative integral value column
  * (cents-style fixed-point is the intended use). k is 1-based per
  * group; rows with NULL value are excluded (they have no rank); an
  * empty input yields an empty result.
  *
  * Returns one row per group: (group, n, k, kth) — deterministic, a pure
  * function of the multiset, so a SQL twin replays it with a rank window.
  */
object Selection {

  /** k chosen per group from its count, e.g. `n => (n + 1) / 2` for the
    * lower median. The weight ≡ 1 case of [[exactKthWeighted]].
    */
  def exactKth(df: DataFrame, groupCol: String, valueCol: String,
      kOf: Long => Long, buckets: Int = 4096,
      maxValue: Option[Long] = None): DataFrame =
    exactKthWeighted(df.withColumn("__one", lit(1L)), groupCol, valueCol,
      "__one", kOf, buckets, maxValue)

  /** WEIGHTED order statistic: the smallest value whose cumulative weight
    * reaches k, with k chosen per group from the group's TOTAL weight
    * (e.g. `W => (W + 1) / 2` = the weighted lower median — for
    * token-weighted document stats, "the length at which half the
    * corpus's token mass sits"). Same two-phase selection as the
    * unweighted form with weight sums in place of counts; `n` in the
    * output is the total weight. Weights must be positive longs; rows
    * with NULL or non-positive weight are excluded (they carry no rank
    * mass).
    */
  def exactKthWeighted(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, kOf: Long => Long, buckets: Int = 4096,
      maxValue: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("wt"))
      .where(col("v").isNotNull && col("wt").isNotNull && col("wt") > 0)
    val maxRow = maxValue.map(org.apache.spark.sql.Row(_))
      .getOrElse(vals.agg(max($"v")).head())
    if (maxRow.isNullAt(0)) // empty input / all-NULL values: nothing ranks
      return spark.createDataFrame(Seq.empty[(String, Long, Long, Long)])
        .toDF("g", "n", "k", "kth")
    val maxV = maxRow.getLong(0)
    val w = maxV / buckets + 1
    // phase 1: (group, bucket) weight histogram — one scan, map-side combined
    val hist = vals.groupBy($"g", ($"v" / w).cast("long").as("b"))
      .agg(sum($"wt").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGroup = hist.groupBy(_._1)
    // driver fold: target bucket + residual rank per group
    val targets: Map[String, (Long, Long, Long, Long)] = byGroup.map {
      case (g, rows) =>
        val n = rows.map(_._3).sum
        val k = kOf(n)
        require(k >= 1 && k <= n, s"k=$k outside [1, $n] for group $g")
        var cum = 0L
        var hit = (-1L, -1L)
        for ((_, b, c) <- rows.sortBy(_._2) if hit._1 < 0) {
          if (cum + c >= k) hit = (b, k - cum) else cum += c
        }
        g -> (n, k, hit._1, hit._2)
    }
    // phase 2: exact per-value weights inside only the target buckets
    val tgt = targets.toSeq.map { case (g, (_, _, b, _)) => (g, b) }
      .toDF("g", "b")
    val inBucket = vals.join(broadcast(tgt),
        vals("g") === tgt("g") && ($"v" / w).cast("long") === tgt("b"))
      .groupBy(vals("g").as("gg"), $"v").agg(sum($"wt").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val answers = targets.map { case (g, (n, k, _, r0)) =>
      var rem = r0
      var ans = -1L
      for ((_, v, c) <- inBucket(g).sortBy(_._2) if ans < 0) {
        if (rem <= c) ans = v else rem -= c
      }
      (g, n, k, ans)
    }.toSeq
    spark.createDataFrame(answers).toDF("g", "n", "k", "kth")
  }
}
