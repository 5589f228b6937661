package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *            ≤ groups·(distinct values per target bucket) counts to the
  *            answer.
  *
  * Two DATA scans plus a max() sizing pass for the bucket width. Skip the
  * sizing pass by passing `maxValue` when the domain is known — e.g. from
  * parquet footer statistics ([[graft.core.FooterStats.longMax]]) or a
  * fixed-point encoding's range. `maxValue` is a granularity hint, not a
  * correctness input: any non-negative value yields the exact answer
  * (values above it simply land in buckets past the knob — the histogram
  * groups by the actual bucket id), so an approximate footer bound is
  * safe. Bucket ids are CLAMPED to an overflow bucket (`id = buckets`),
  * so an underestimated maxValue can widen one bucket but can never
  * inflate the histogram past maxGroups·(buckets+1) rows — cap overflow
  * therefore always means group cardinality, never a bad size hint.
  *
  * Driver-table contract — ENFORCED, degrading instead of dying: both
  * phases collect aggregate tables only, and both collects are
  * hard-bounded by `limit(...)` before they reach the driver. A caller
  * grouping by a high-cardinality key (doc_id) overflows the histogram
  * ceiling and the kernel FALLS BACK to the distributed rank path —
  * per-group sorted fold over the (group, value) weight table, executor-
  * side, exact, never a driver collect. That regime has many SMALL
  * groups, which is exactly when per-group buffering is cheap; the
  * two-phase histogram exists for the opposite regime (few groups,
  * corpus-sized value multisets). Pass `strict = true` to get the old
  * `require` failure instead (for pipelines where a group-cardinality
  * drift must abort, not degrade). Phase 1's per-bucket `min(v)` also
  * enforces the non-negative value contract (truncating division would
  * silently fold (−w, 0) into bucket 0 otherwise), and the sizing pass
  * additionally rejects negative domains up front when it runs.
  *
  * Requires a non-negative integral value column (cents-style fixed-point
  * is the intended use). k is 1-based per group; rows with NULL value are
  * excluded (they have no rank); an empty input yields an empty result.
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
      maxValue: Option[Long] = None, maxGroups: Int = 64,
      strict: Boolean = false): DataFrame =
    exactKthWeighted(df.withColumn("__one", lit(1L)), groupCol, valueCol,
      "__one", kOf, buckets, maxValue, maxGroups, strict)

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
      maxValue: Option[Long] = None, maxGroups: Int = 64,
      strict: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(buckets > 0 && maxGroups > 0,
      s"buckets=$buckets and maxGroups=$maxGroups must be positive")
    // +1: the overflow bucket (values past an underestimated maxValue)
    val driverCap = maxGroups.toLong * (buckets + 1)
    require(driverCap <= 8L * 1024 * 1024,
      s"maxGroups·(buckets+1) = $driverCap exceeds the 8M driver-row ceiling; " +
        "shrink one knob")
    val vals = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("wt"))
      .where(col("v").isNotNull && col("wt").isNotNull && col("wt") > 0)
    val maxV = maxValue match {
      case Some(m) =>
        require(m >= 0, s"maxValue=$m must be non-negative")
        m
      case None =>
        val row = vals.agg(max($"v"), min($"v")).head()
        if (row.isNullAt(0)) // empty input / all-NULL values: nothing ranks
          return spark.createDataFrame(Seq.empty[(String, Long, Long, Long)])
            .toDF("g", "n", "k", "kth")
        require(row.getLong(1) >= 0,
          s"value column $valueCol has negative values (min=${row.getLong(1)}); " +
            "the kernel requires a non-negative integral domain")
        row.getLong(0)
    }
    val w = maxV / buckets + 1
    // bucket id, clamped into [0, buckets]: values past an underestimated
    // maxValue all land in the single overflow bucket `buckets` (they are
    // by construction the largest values, so the fold order stays right),
    // instead of fanning out into unbounded ids that could blow the
    // driver cap and misread as group cardinality
    def bucketOf(v: Column): Column = least((v / w).cast("long"), lit(buckets.toLong))
    // phase 1: (group, bucket) weight histogram — one scan, map-side
    // combined; limit() hard-bounds the driver BEFORE collect fires
    val hist = vals.groupBy($"g", bucketOf($"v").as("b"))
      .agg(sum($"wt").as("c"), min($"v").as("mv"))
      .limit((driverCap + 1).toInt)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    hist.find(_._4 < 0).foreach { case (g, _, _, mv) =>
      throw new IllegalArgumentException(
        s"value column $valueCol has negative values (group $g min=$mv); " +
          "the kernel requires a non-negative integral domain")
    }
    val byGroup = hist.groupBy(_._1)
    // with clamped bucket ids each group owns ≤ buckets+1 histogram rows,
    // so either overflow condition can only mean too many GROUPS
    if (hist.length > driverCap || byGroup.size > maxGroups) {
      require(!strict,
        s"${byGroup.size}${if (hist.length > driverCap) "+" else ""} groups " +
          s"exceed maxGroups=$maxGroups (strict mode) — raise maxGroups, or " +
          "drop strict to degrade to the distributed rank fallback")
      return rankFallback(vals, kOf)
    }
    // driver fold: target bucket + residual rank per group
    val targets: Map[String, (Long, Long, Long, Long)] = byGroup.map {
      case (g, rows) =>
        val n = rows.map(_._3).sum
        val k = kOf(n)
        require(k >= 1 && k <= n, s"k=$k outside [1, $n] for group $g")
        var cum = 0L
        var hit = (-1L, -1L)
        for ((_, b, c, _) <- rows.sortBy(_._2) if hit._1 < 0) {
          if (cum + c >= k) hit = (b, k - cum) else cum += c
        }
        g -> (n, k, hit._1, hit._2)
    }
    // phase 2: exact per-value weights inside only the target buckets.
    // Its natural size is groups × (distinct values per target bucket) —
    // independent of the buckets knob — so it gets its own absolute
    // ceiling: a pathological value concentration inside one bucket
    // fails loudly (raise `buckets` so each bucket narrows further)
    val phase2Cap = 4L * 1024 * 1024
    val tgt = targets.toSeq.map { case (g, (_, _, b, _)) => (g, b) }
      .toDF("g", "b")
    val inBucketRows = vals.join(broadcast(tgt),
        vals("g") === tgt("g") && bucketOf($"v") === tgt("b"))
      .groupBy(vals("g").as("gg"), $"v").agg(sum($"wt").as("c"))
      .limit((phase2Cap + 1).toInt)
      .collect()
    // raising `buckets` narrows ordinary buckets but can never subdivide
    // the OVERFLOW bucket — if the kth landed there, the actionable fix
    // is the size hint, and the error must say so (ADVICE-class follow-up
    // to the r13 clamp)
    require(inBucketRows.length <= phase2Cap, {
      val overflowHit = targets.values.exists(_._3 == buckets.toLong)
      if (overflowHit)
        s"target buckets hold more than $phase2Cap distinct values and the " +
          s"kth statistic falls in the overflow bucket — the supplied " +
          s"maxValue ($maxV) underestimates the value domain; raise maxValue"
      else
        s"target buckets hold more than $phase2Cap distinct values — " +
          "raise `buckets` so each bucket narrows further"
    })
    val inBucket = inBucketRows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
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

  /** Distributed rank fallback for the many-small-groups regime: the
    * (group, value) weight table shuffles once on the group key and each
    * group's ≤ |distinct values| entries fold inside its own task —
    * executor-side buffering bounded by the largest single group, no
    * driver collect at any cardinality. Same output contract and the same
    * k ∈ [1, n] enforcement as the histogram path (a bad kOf fails the
    * task, not silently).
    */
  private def rankFallback(vals: DataFrame, kOf: Long => Long): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    vals.groupBy($"g", $"v").agg(sum($"wt").as("c"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val arr = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        require(arr.head._1 >= 0,
          s"value column has negative values (group $g min=${arr.head._1}); " +
            "the kernel requires a non-negative integral domain")
        val n = arr.iterator.map(_._2).sum
        val k = kOf(n)
        require(k >= 1 && k <= n, s"k=$k outside [1, $n] for group $g")
        var cum = 0L
        var ans = arr.last._1
        var i = 0
        while (i < arr.length && cum < k) {
          cum += arr(i)._2
          if (cum >= k) ans = arr(i)._1
          i += 1
        }
        (g, n, k, ans)
      }
      .toDF("g", "n", "k", "kth")
  }
}
