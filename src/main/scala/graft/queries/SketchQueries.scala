package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sampling

/** Mergeable-sketch operators — the summaries a 100 TB profiling pass
  * actually ships to the driver. Exact per-column statistics (distinct
  * counts, frequency tables) are themselves corpus-sized shuffles; the
  * sketches here are the bounded-size stand-ins, and every query carries
  * its own "measure, don't guess" audit: the exact answer is computed
  * beside the estimate at test scale so the error is a deliverable, not
  * folklore. All hashing is the shared md5 kernel (Sampling.detRand /
  * TextFunctions.hexPolySql) so the DuckDB oracle replays the sketch
  * content bit-for-bit — these are deterministic data structures, not
  * RNG-dependent approximations.
  *
  * Extends the reference's profiling surface (its per-column value
  * counts, e.g. profiling in DataLoader.py / eval_utils.py, are exact
  * pandas ops that fit because its tables are small) with the
  * sublinear-memory equivalents that survive when a column no longer
  * fits. Siblings elsewhere in the registry: q120 (HLL distinct,
  * verdict-gated because Spark's sketch has no DuckDB twin), q166
  * (count-min frequencies), q201/q206 (Misra-Gries heavy hitters,
  * batch + streaming). q210 here is the distinct-count sketch whose
  * CONTENT the oracle replays exactly, not just its verdict.
  */
object SketchQueries extends Registry {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** KMV sample size. */
  private val kmvK = 256

  /** (table, column) pairs profiled by q210 — two int keys, two strings
    * (one short, one corpus text).
    */
  private val kmvCols: Seq[(String, String)] = Seq(
    ("lineitem", "l_partkey"), ("orders", "o_custkey"),
    ("customer", "c_name"), ("documents", "text"))

  override def entries: Seq[Q] = Seq(

    // ---- KMV (k-minimum-values) distinct-count sketch, one row per
    //      profiled column: hash every value to the deterministic
    //      detRand uniform, keep the k smallest DISTINCT hashes, estimate
    //      |D| ≈ (k-1)/u_k. The plan is the scale story: values are
    //      hashed scan-side, so the DISTINCT is a map-side-combined
    //      aggregate over 8-byte doubles (never shuffles strings), and
    //      the k-cut is orderBy+limit → TakeOrdered's bounded per-
    //      partition heap, NOT a global sort. The sketch is provably
    //      mergeable — min-k of a union = min-k of the per-part min-ks —
    //      and the query REPLAYS that: the value space is split by the
    //      hash itself (u<1/2 vs u≥1/2, disjoint by construction for any
    //      type), sketched per half, merged, and `merge_ok` asserts the
    //      merged u_k equals the direct one. exact_distinct (the full
    //      countDistinct shuffle the sketch replaces) is the test-scale
    //      audit; rel_err lands ~1/√k. All doubles are the shared md5
    //      draw → bit-identical in DuckDB. ---------------------------------
    Q("q210_kmv_distinct",
      (s, dir) => {
        import s.implicits._
        kmvCols.map { case (tab, c) =>
          val base = t(s, dir, tab)
            .where(col(c).isNotNull)
            .select(Sampling.detRand(41L, col(c).cast("string")).as("u"))
            .distinct()
          def kcut(d: org.apache.spark.sql.DataFrame) =
            d.orderBy($"u").limit(kmvK)
          val direct = kcut(base)
            .agg(max($"u").as("u_k"), count(lit(1)).as("k_got"))
          val merged = kcut(
              kcut(base.where($"u" < 0.5)).unionByName(kcut(base.where($"u" >= 0.5))))
            .agg(max($"u").as("u_k2"))
          val exact = t(s, dir, tab)
            .agg(countDistinct(col(c)).as("exact_distinct"))
          direct.crossJoin(merged).crossJoin(exact)
            .select(lit(s"$tab.$c").as("col_name"),
              $"k_got".cast("long").as("k"),
              $"u_k",
              (($"k_got" - 1).cast("double") / $"u_k").as("est_distinct"),
              $"exact_distinct".cast("long").as("exact_distinct"),
              round(abs(($"k_got" - 1).cast("double") / $"u_k"
                  - $"exact_distinct".cast("double"))
                / $"exact_distinct".cast("double"), 6).as("rel_err"),
              when($"u_k2" === $"u_k", 1).otherwise(0).cast("int").as("merge_ok"))
        }.reduce(_ unionByName _).orderBy($"col_name")
      },
      Some(kmvCols.map { case (tab, c) =>
        val u = Sampling.detRandSql(41L, Seq(s"CAST($c AS VARCHAR)"))
        s"""SELECT '$tab.$c' AS col_name,
            CAST(k_got AS BIGINT) AS k, u_k,
            CAST(k_got - 1 AS DOUBLE) / u_k AS est_distinct,
            CAST(exact_distinct AS BIGINT) AS exact_distinct,
            round(abs(CAST(k_got - 1 AS DOUBLE) / u_k
                - CAST(exact_distinct AS DOUBLE))
              / CAST(exact_distinct AS DOUBLE), 6) AS rel_err,
            CAST(CASE WHEN u_k2 = u_k THEN 1 ELSE 0 END AS INT) AS merge_ok
          FROM (SELECT max(u) AS u_k, count(*) AS k_got FROM
                 (SELECT u FROM (SELECT DISTINCT $u AS u FROM $tab
                                 WHERE $c IS NOT NULL)
                  ORDER BY u LIMIT $kmvK)),
               (SELECT max(u) AS u_k2 FROM
                 (SELECT u FROM (
                    (SELECT u FROM (SELECT DISTINCT $u AS u FROM $tab
                                    WHERE $c IS NOT NULL)
                     WHERE u < 0.5 ORDER BY u LIMIT $kmvK)
                    UNION ALL
                    (SELECT u FROM (SELECT DISTINCT $u AS u FROM $tab
                                    WHERE $c IS NOT NULL)
                     WHERE u >= 0.5 ORDER BY u LIMIT $kmvK))
                  ORDER BY u LIMIT $kmvK)),
               (SELECT count(DISTINCT $c) AS exact_distinct FROM $tab)"""
      }.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")))
  )
}
