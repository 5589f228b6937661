package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.eval.Metrics
import graft.operators.Sampling
import graft.ops.{Ensemble, PromptRenderer}

/** Evaluation-harness operators (SURVEY §2.D5/D7/D11/D15, H3, B8, C6) as
  * driver-gated queries over the benchmark tables. Each query feeds the
  * production operator deterministic, table-derived inputs so the DuckDB
  * oracle can hash-check the full path — per VERDICT round 2 item 1c these
  * were previously ScalaTest-only.
  *
  * Determinism note: the CI/stats queries use integer-derived metrics
  * (counts, token counts), so every floating sum is exactly associative and
  * the exact-sum variance in [[graft.eval.Metrics]] matches the
  * single-threaded oracle bit-for-bit at any parallelism.
  */
object EvalQueries extends Registry {

  /** Cumulative Poisson(1) CDF thresholds for q269's deterministic draw:
    * k = #{thresholds below u}. One source of truth for BOTH engines —
    * the Spark CASE and the oracle CASE are generated from this Seq, so a
    * literal can never drift between them. Truncation at k=8 (mass 1.1e-6)
    * biases a replicate weight once per ~900k draws — irrelevant to a CI
    * and identical on both sides by construction.
    */
  private val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** q269 bootstrap replicate count. ⌈0.025·64⌉ = 2 and ⌈0.975·64⌉ = 63,
    * so both CI edges are interior order statistics, not the sample min/max.
    */
  private val nBoot = 64

  override def entries: Seq[Q] = Seq(

    // ---- POISSONIZED BOOTSTRAP CI (r11): the distributed bootstrap — true
    //      resample-with-replacement needs the global row count per draw,
    //      but Poisson(1) per (row, replica) weights approximate the
    //      multinomial independently per row, which is the ONLY reason a
    //      bootstrap distributes (each row computes its 64 replicate
    //      weights from its own key — one pass, map-side combine to
    //      (lang, replica) sufficient statistics, never a re-shuffle per
    //      replica). Weights are the deterministic inverse-CDF walk over
    //      the shared md5 uniform (thresholds from [[poissonCdf]], single
    //      source for both engines), so DuckDB rebuilds every replicate
    //      mean bit-for-bit: mean_b = Σk·x / Σk with exact long sums and
    //      ONE division. CI = interior order statistics of the 64 sorted
    //      replicate means (sort_array aggregation, no window); the
    //      normal-approx CI from exact sufficient statistics rides along
    //      so the deliverable shows what the bootstrap buys (asymmetry)
    //      next to what it costs (64× weight algebra, not 64× scans). ------
    Q("q269_bootstrap_ci",
      (s, dir) => {
        import s.implicits._
        val reps = Tables(s, dir, "documents")
          .select($"doc_id", $"lang", $"n_chars".cast("long").as("x"))
          .select($"doc_id", $"lang", $"x",
            explode(sequence(lit(0), lit(nBoot - 1))).as("b"))
          .withColumn("u", Sampling.detRand(269L,
            $"doc_id".cast("string"), $"b".cast("string")))
          .withColumn("k", poissonCdf.foldLeft(lit(0L)) {
            (acc, c) => acc + when($"u" >= c, 1L).otherwise(0L) })
        // greatest(Σk, 1): a zero-weight replicate (all docs draw k=0,
        // probability e^-n per replicate — unreachable at benchmark group
        // sizes, reachable if the driver ever regenerates a tiny lang)
        // must NOT diverge between engines: Spark's 0-divisor yields NULL
        // which collect_list silently DROPS (shifting the order-statistic
        // indices) while DuckDB's list() keeps it. With the guard both
        // engines produce an exact 0.0 for that replicate.
        val boot = reps.groupBy($"lang", $"b")
          .agg((sum($"k" * $"x").cast("double")
            / greatest(sum($"k"), lit(1L)).cast("double")).as("mean_b"))
          .groupBy($"lang")
          .agg(sort_array(collect_list($"mean_b")).as("ms"))
          .select($"lang",
            element_at($"ms", math.ceil(0.025 * nBoot).toInt).as("boot_lo"),
            element_at($"ms", math.ceil(0.975 * nBoot).toInt).as("boot_hi"))
        val stats = Tables(s, dir, "documents")
          .select($"lang", $"n_chars".cast("long").as("x"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
            sum($"x" * $"x").as("sxx"))
          .select($"lang", $"n",
            ($"sx".cast("double") / $"n".cast("double")).as("mean_chars"),
            // greatest(n-1, 1): same cross-engine guard for a 1-doc group
            sqrt(($"sxx".cast("double")
                - $"sx".cast("double") * $"sx".cast("double") / $"n".cast("double"))
              / greatest($"n" - 1, lit(1L)).cast("double")).as("sd"))
        stats.join(boot, Seq("lang"))
          .select($"lang", $"n", $"mean_chars",
            $"boot_lo", $"boot_hi",
            ($"mean_chars" - lit(1.96) * $"sd" / sqrt($"n".cast("double")))
              .as("norm_lo"),
            ($"mean_chars" + lit(1.96) * $"sd" / sqrt($"n".cast("double")))
              .as("norm_hi"))
          .orderBy($"lang")
      },
      Some {
        val u = Sampling.detRandSql(269L,
          Seq("CAST(doc_id AS VARCHAR)", "CAST(b AS VARCHAR)"))
        val kExpr = poissonCdf
          .map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH reps AS (SELECT lang, b, CAST(n_chars AS BIGINT) AS x, $u AS u
              FROM documents, UNNEST(range(0, $nBoot)) AS r(b)),
          kk AS (SELECT lang, b, x, CAST($kExpr AS BIGINT) AS k FROM reps),
          bm AS (SELECT lang, b, CAST(sum(k * x) AS DOUBLE)
                   / CAST(greatest(sum(k), 1) AS DOUBLE) AS mean_b
                 FROM kk GROUP BY lang, b),
          boot AS (SELECT lang, ms[${math.ceil(0.025 * nBoot).toInt}] AS boot_lo,
                     ms[${math.ceil(0.975 * nBoot).toInt}] AS boot_hi
                   FROM (SELECT lang, list(mean_b ORDER BY mean_b) AS ms
                         FROM bm GROUP BY lang)),
          st AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
                 FROM (SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents)
                 GROUP BY lang),
          sv AS (SELECT lang, n,
                   CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_chars,
                   sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(greatest(n - 1, 1) AS DOUBLE)) AS sd
                 FROM st)
          SELECT sv.lang, CAST(n AS BIGINT) AS n, mean_chars, boot_lo, boot_hi,
            mean_chars - 1.96 * sd / sqrt(CAST(n AS DOUBLE)) AS norm_lo,
            mean_chars + 1.96 * sd / sqrt(CAST(n AS DOUBLE)) AS norm_hi
          FROM sv JOIN boot ON sv.lang = boot.lang
          ORDER BY sv.lang"""
      }),

    // ---- D5: cross-seed 95% CI over per-seed aggregates ------------------
    //      pseudo-seeds synthesized as o_orderkey % 5; metric = per-seed
    //      order count per priority class (integer-valued → exact)
    Q("q52_cross_seed_ci",
      (s, dir) => {
        import s.implicits._
        val perSeed = Tables(s, dir, "orders")
          .groupBy($"o_orderpriority", ($"o_orderkey" % 5).as("seed"))
          .agg(count(lit(1)).cast("double").as("m"))
        Metrics.crossSeedCI(perSeed, Seq("o_orderpriority"), "m")
          .orderBy($"o_orderpriority")
      },
      Some("""WITH ps AS (SELECT o_orderpriority, o_orderkey % 5 AS seed,
            CAST(count(*) AS DOUBLE) AS m
          FROM orders GROUP BY 1, 2)
        SELECT o_orderpriority,
          sum(m) / count(*) AS mean,
          CAST(count(*) AS BIGINT) AS n,
          1.96 * sqrt(CASE WHEN count(*) > 1
              THEN greatest((sum(m*m) - sum(m)*sum(m)/count(*)) / (count(*) - 1), 0.0)
              ELSE 0.0 END) / sqrt(count(*)) AS ci95
        FROM ps GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- D11: token/cost stats with Student-t CI over document tokens ----
    Q("q53_token_stats",
      (s, dir) => {
        import s.implicits._
        val toks = Tables(s, dir, "documents")
          .select(size(split($"text", " ")).as("tokens"))
        // 1.96 ≈ t(0.975, n→∞); the quantile is a caller-side input
        Metrics.tokenStats(toks, "tokens", tQuantile = 1.96)
      },
      Some("""WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS INT) AS tokens
          FROM documents)
        SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
          sum(CAST(tokens AS DOUBLE)) / count(*) AS mean_tokens,
          CAST(count(*) AS BIGINT) AS n,
          1.96 * sqrt(CASE WHEN count(*) > 1
              THEN greatest((sum(CAST(tokens AS DOUBLE) * tokens)
                             - sum(CAST(tokens AS DOUBLE)) * sum(CAST(tokens AS DOUBLE)) / count(*))
                            / (count(*) - 1), 0.0)
              ELSE 0.0 END) / sqrt(count(*)) AS ci95_t
        FROM t""")),

    // ---- D15: pass-rate per group, best config wins ----------------------
    //      metric = l_quantity/25 (>=1 "passes"); fraction is an exact
    //      0/1 average, max over l_linestatus configs
    Q("q54_pass_rate",
      (s, dir) => {
        import s.implicits._
        val df = Tables(s, dir, "lineitem")
          .select($"l_returnflag", $"l_linestatus",
            ($"l_quantity" / 25.0).as("m"))
        Metrics.passRate(df, Seq("l_returnflag"), "l_linestatus", "m")
          .orderBy($"l_returnflag")
      },
      Some("""WITH per AS (SELECT l_returnflag, l_linestatus,
            avg(CASE WHEN l_quantity / 25.0 >= 1.0 THEN 1.0 ELSE 0.0 END) AS pass_rate
          FROM lineitem GROUP BY 1, 2)
        SELECT l_returnflag, max(pass_rate) AS best_pass_rate
        FROM per GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- D7: yes/no vote majority over customer-derived votes ------------
    //      vote = sign of account balance; pair keys from segment/nation
    Q("q55_yes_no_majority",
      (s, dir) => {
        import s.implicits._
        val votes = Tables(s, dir, "customer").select(
          $"c_mktsegment".as("case_id"),
          $"c_nationkey".cast("string").as("query_attr"),
          lit("acctbal").as("src_attr"),
          lit("positive").as("tgt_attr"),
          when($"c_acctbal" > 0, "yes").otherwise("no").as("vote"))
        Ensemble.yesNoMajority(votes)
          .orderBy($"case_id", $"query_attr")
      },
      Some("""SELECT c_mktsegment AS case_id,
          CAST(c_nationkey AS VARCHAR) AS query_attr,
          'acctbal' AS src_attr, 'positive' AS tgt_attr
        FROM customer
        GROUP BY 1, 2, 3, 4
        HAVING sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
             > sum(CASE WHEN c_acctbal > 0 THEN 0 ELSE 1 END)
        ORDER BY case_id, query_attr""")),

    // ---- H3: ensemble disjoint (union − intersection) over three
    //      year-sliced "runs" of order predictions --------------------------
    Q("q56_ensemble_disjoint",
      (s, dir) => {
        import s.implicits._
        val o = Tables(s, dir, "orders")
        def run(y: Int, id: Int) = o
          .filter(year($"o_orderdate") === y)
          .select(lit("orders").as("case_id"),
            $"o_orderpriority".as("query_attr"),
            $"o_orderstatus".as("src_attr"),
            ($"o_custkey" % 100).cast("string").as("tgt_attr"))
          .withColumn("run_id", lit(id))
        val runs = run(1995, 1).unionByName(run(1996, 2)).unionByName(run(1997, 3))
        Ensemble.disjoint(runs, nRuns = 3)
          .orderBy($"case_id", $"query_attr", $"src_attr", $"tgt_attr")
      },
      Some("""WITH r1 AS (SELECT DISTINCT 'orders' AS case_id, o_orderpriority AS query_attr,
            o_orderstatus AS src_attr, CAST(o_custkey % 100 AS VARCHAR) AS tgt_attr
          FROM orders WHERE extract(year FROM o_orderdate) = 1995),
        r2 AS (SELECT DISTINCT 'orders' AS case_id, o_orderpriority AS query_attr,
            o_orderstatus AS src_attr, CAST(o_custkey % 100 AS VARCHAR) AS tgt_attr
          FROM orders WHERE extract(year FROM o_orderdate) = 1996),
        r3 AS (SELECT DISTINCT 'orders' AS case_id, o_orderpriority AS query_attr,
            o_orderstatus AS src_attr, CAST(o_custkey % 100 AS VARCHAR) AS tgt_attr
          FROM orders WHERE extract(year FROM o_orderdate) = 1997),
        u AS (SELECT * FROM r1 UNION SELECT * FROM r2 UNION SELECT * FROM r3),
        i AS (SELECT * FROM r1 INTERSECT SELECT * FROM r2 INTERSECT SELECT * FROM r3)
        SELECT case_id, query_attr, src_attr, tgt_attr FROM u
        EXCEPT SELECT case_id, query_attr, src_attr, tgt_attr FROM i
        ORDER BY case_id, query_attr, src_attr, tgt_attr""")),

    // ---- B8: stable row-index window over a total sort -------------------
    Q("q57_row_range",
      (s, dir) => {
        import s.implicits._
        Sampling.rowRange(
            Tables(s, dir, "lineitem")
              .select($"l_orderkey", $"l_linenumber", $"l_quantity"),
            sortCols = Seq("l_orderkey", "l_linenumber"),
            start = 100, end = 149)
          .orderBy($"row_idx")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
          CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS BIGINT) AS row_idx
        FROM lineitem
        QUALIFY row_idx BETWEEN 100 AND 149
        ORDER BY row_idx""")),

    // ---- prediction-error classification (eval_utils.py:247-307) ---------
    //      schemas synthesized from the distinct market segments (source =
    //      segment names, target = t_-prefixed); predictions derived per
    //      customer row by c_custkey % 4 to cover every category: valid /
    //      same-attr / same-schema-rotation / invalid-first
    Q("q59_error_categories",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val segs = cust.select(lower($"c_mktsegment").as("seg")).distinct()
        val caseIds = cust.select(($"c_nationkey" % 3).cast("string").as("case_id")).distinct()
        val schemaCols = caseIds.crossJoin(segs)
          .select($"case_id", $"seg".as("col"),
            lit(true).as("in_src"), lit(false).as("in_tgt"))
          .unionByName(caseIds.crossJoin(segs)
            .select($"case_id", concat(lit("t_"), $"seg").as("col"),
              lit(false).as("in_src"), lit(true).as("in_tgt")))
        val rot = expr("""CASE lower(c_mktsegment)
          WHEN 'automobile' THEN 'building' WHEN 'building' THEN 'furniture'
          WHEN 'furniture' THEN 'household' WHEN 'household' THEN 'machinery'
          ELSE 'automobile' END""")
        val preds = cust.select(
          ($"c_nationkey" % 3).cast("string").as("case_id"),
          when($"c_custkey" % 4 === 3, concat(lit("zz_"), lower($"c_mktsegment")))
            .otherwise(lower($"c_mktsegment")).as("first"),
          when($"c_custkey" % 4 === 1, lower($"c_mktsegment"))
            .when($"c_custkey" % 4 === 2, rot)
            .otherwise(concat(lit("t_"), lower($"c_mktsegment"))).as("second"))
        Metrics.errorCategories(preds, schemaCols).orderBy($"case_id")
      },
      Some("""WITH segs AS (SELECT DISTINCT lower(c_mktsegment) AS seg FROM customer),
        cases AS (SELECT DISTINCT CAST(c_nationkey % 3 AS VARCHAR) AS case_id FROM customer),
        sc AS (SELECT case_id, seg AS col, TRUE AS in_src, FALSE AS in_tgt FROM cases, segs
               UNION ALL
               SELECT case_id, 't_' || seg, FALSE, TRUE FROM cases, segs),
        preds AS (SELECT CAST(c_nationkey % 3 AS VARCHAR) AS case_id,
            CASE WHEN c_custkey % 4 = 3 THEN 'zz_' || lower(c_mktsegment)
                 ELSE lower(c_mktsegment) END AS pfirst,
            CASE c_custkey % 4
              WHEN 1 THEN lower(c_mktsegment)
              WHEN 2 THEN CASE lower(c_mktsegment)
                WHEN 'automobile' THEN 'building' WHEN 'building' THEN 'furniture'
                WHEN 'furniture' THEN 'household' WHEN 'household' THEN 'machinery'
                ELSE 'automobile' END
              ELSE 't_' || lower(c_mktsegment) END AS psecond
          FROM customer),
        m AS (SELECT p.case_id, p.pfirst, p.psecond,
            coalesce(s1.in_src, FALSE) AS f_src, coalesce(s1.in_tgt, FALSE) AS f_tgt,
            coalesce(s2.in_src, FALSE) AS s_src, coalesce(s2.in_tgt, FALSE) AS s_tgt
          FROM preds p
          LEFT JOIN sc s1 ON p.case_id = s1.case_id AND p.pfirst = s1.col
          LEFT JOIN sc s2 ON p.case_id = s2.case_id AND p.psecond = s2.col)
        SELECT case_id,
          CAST(sum(CASE WHEN f_src AND s_tgt THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
          CAST(sum(CASE WHEN NOT (f_src AND s_tgt) THEN
              (CASE WHEN NOT f_src AND NOT f_tgt THEN 1 ELSE 0 END)
            + (CASE WHEN NOT s_src AND NOT s_tgt THEN 1 ELSE 0 END)
            ELSE 0 END) AS BIGINT) AS n_invalid_attr,
          CAST(sum(CASE WHEN NOT (f_src AND s_tgt)
              AND ((f_src AND s_src AND NOT s_tgt) OR (f_tgt AND s_tgt AND NOT f_src))
              THEN 1 ELSE 0 END) AS BIGINT) AS n_same_schema,
          CAST(sum(CASE WHEN NOT (f_src AND s_tgt)
              AND ((f_src AND s_src AND NOT s_tgt) OR (f_tgt AND s_tgt AND NOT f_src))
              AND pfirst = psecond THEN 1 ELSE 0 END) AS BIGINT) AS n_same_attr
        FROM m GROUP BY case_id ORDER BY case_id""")),

    // ---- F7/B5: response parsing + prediction validation, end-to-end -----
    //      responses are GENERATED per customer row in the five shapes the
    //      parsers must handle (json-after-noise, invalid attr, no json,
    //      empty matches, first-valid-wins on a matches-less block), so the
    //      oracle can recompute the expected outcome straight from the
    //      table: if parseMatches / columnInSchema / validateCandidates
    //      drift, the per-segment counts diverge
    Q("q63_parse_validate",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val segs: Seq[String] = cust.select(upper($"c_mktsegment")).distinct()
          .as[String].collect().toSeq.sorted
        val segSet = segs.toSet
        cust.select($"c_custkey".cast("long"), upper($"c_mktsegment"))
          .as[(Long, String)]
          .map { case (k, segU) =>
            val text = (k % 5) match {
              case 0 => s"Sure:\n```sql\nSELECT 1\n```\n" +
                s"""{"matches": ["$segU"]} — hope that helps"""
              case 1 => s"""{"matches": ["zz_$segU"]}"""
              case 2 => "no structured answer at all"
              case 3 => """{"matches": []}"""
              case _ => s"""{"other": ["x"]} {"matches": ["$segU"]}"""
            }
            val nValid = graft.ops.Parsers.parseMatches(text)
              .count(p => graft.ops.Parsers.columnInSchema(p, segs)).toLong
            val candRaw = if (k % 3 == 0) s"$segU, zzz" else segU
            val candOk =
              if (graft.ops.Parsers.validateCandidates(candRaw, segSet).isDefined) 1L else 0L
            (segU.toLowerCase(java.util.Locale.ROOT), nValid, candOk)
          }
          .toDF("src_attr", "v", "c")
          .groupBy($"src_attr")
          .agg(sum($"v").as("n_valid"), sum($"c").as("n_cand_ok"))
          .orderBy($"src_attr")
      },
      Some("""SELECT lower(c_mktsegment) AS src_attr,
          CAST(sum(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
          CAST(sum(CASE WHEN c_custkey % 3 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_cand_ok
        FROM customer GROUP BY 1 ORDER BY 1""")),

    // ---- C6: nearest-demo selection as a distributed top-k ---------------
    Q("q58_nearest_demos",
      (s, dir) => {
        import s.implicits._
        PromptRenderer.nearestDemosDf(
            Tables(s, dir, "supplier").select($"s_suppkey", $"s_acctbal"),
            idCol = "s_suppkey", ratioCol = "s_acctbal",
            targetRatio = 1000.0, k = 10)
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_acctbal FROM (
          SELECT s_suppkey, s_acctbal FROM supplier
          ORDER BY abs(s_acctbal - 1000.0), s_suppkey LIMIT 10)
        ORDER BY s_suppkey"""))
  )
}
