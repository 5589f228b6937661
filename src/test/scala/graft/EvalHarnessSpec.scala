package graft

import org.apache.spark.sql.functions._
import graft.core.Readers
import graft.eval.{Metrics, Report}
import graft.llm.{LlmOperator, MockLlmClient}
import graft.ops.{Parsers, PromptRenderer, ScoreFusion}

/** The evaluation harness end-to-end (SURVEY §3.1 steps 3-4): mock
  * predictions over real cases → validate → set-compare vs gold →
  * P/R/F1/effort → categorize by case dims → cross-seed CI → report.
  */
class EvalHarnessSpec extends SparkSpec {

  private val ehr = "/root/reference/Stable Schema Matching/data/ehr/ehr_dataset.json"

  test("grouped evaluation with case dims and cross-seed CI over mock runs") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(ehr)))
    val s = spark
    import s.implicits._
    val cases = Readers.schemaPairJson(spark, ehr).take(6)
    val gold = s.createDataset(cases.flatMap(tc =>
      tc.goldMapping.map(g => (tc.id, g._1.toLowerCase, g._2.toLowerCase))))
      .toDF("case_id", "src_attr", "tgt_attr")

    val perSeed = Seq(1, 2, 3).map { seed =>
      // the seed perturbs the prompt (shuffled schema order), so the mock
      // LLM yields run-dependent predictions like real sampling would
      val questions = s.createDataset(for {
        tc <- cases.map(Readers.shuffleCase(_, seed))
        tgt <- tc.targetSchema.map(_.name)
      } yield PromptRenderer.n2oneQuestion(tc, tgt, Map.empty))
      val preds = LlmOperator.generate(questions, MockLlmClient.Factory())
        .flatMap(g => Parsers.parseMatches(g.response)
          .map(m => (g.caseId, m.toLowerCase, g.queryAttr.toLowerCase)))
        .toDF("case_id", "src_attr", "tgt_attr")
      val tp = preds.intersect(gold).groupBy($"case_id").agg(count(lit(1)).as("tp"))
      val fp = preds.except(gold).groupBy($"case_id").agg(count(lit(1)).as("fp"))
      val fn = gold.except(preds).groupBy($"case_id").agg(count(lit(1)).as("fn"))
      val counts = gold.select($"case_id").distinct()
        .join(tp, Seq("case_id"), "left").join(fp, Seq("case_id"), "left")
        .join(fn, Seq("case_id"), "left")
        .select($"case_id",
          coalesce($"tp", lit(0L)).cast("double").as("tp"),
          coalesce($"fp", lit(0L)).cast("double").as("fp"),
          coalesce($"fn", lit(0L)).cast("double").as("fn"),
          lit(0.0).as("tn"))
      ScoreFusion.caseDims(Metrics.withPrfAccuracyEffort(counts))
        .withColumn("seed", lit(seed))
    }.reduce(_ unionByName _)

    // per (source db) grouped means, then CI across seeds
    val bySeed = perSeed.groupBy($"src_db", $"seed").agg(avg($"f1").as("f1"))
    val ci = Metrics.crossSeedCI(bySeed, Seq("src_db"), "f1").collect()
    assert(ci.nonEmpty)
    ci.foreach { r =>
      val (mean, n, half) = (r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(mean >= 0.0 && mean <= 1.0 && n == 3 && half >= 0.0)
    }
    // metrics bounded; effort non-negative
    val m = perSeed.agg(min($"precision"), max($"precision"), min($"effort")).head()
    assert(m.getDouble(0) >= 0.0 && m.getDouble(1) <= 1.0 && m.getDouble(2) >= 0.0)
    // report renders
    val md = Report.markdown(Metrics.crossSeedCI(bySeed, Seq("src_db"), "f1"))
    assert(md.contains("| src_db |") || md.contains("| mean |") || md.startsWith("|"))
  }

  test("MCQ / confidence / TaDa reprs render and parse round-trip") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(ehr)))
    val tc = Readers.schemaPairJson(spark, ehr).head
    val tgt = tc.targetSchema.head.name
    val mcq = PromptRenderer.mcqQuestion(tc, tgt)
    assert(mcq.prompt.contains("1. ") && mcq.candidates.last == "There is no match.")
    val conf = PromptRenderer.confidenceMcq(tc, tgt)
    assert(conf.prompt.contains("A. ") && conf.candidates.size <= 6)
    // a mock-ish answer in the expected shape parses back
    assert(Parsers.parseMcqLetter("Answer: B\nConfidence: 73").contains("B"))
    assert(Parsers.parseConfidence("Answer: B\nConfidence: 73").contains(73))
    val tada = PromptRenderer.tadaQuestion(tc, tc.sourceSchema.head.name, tgt)
    assert(tada.candidates == Seq("yes", "no"))
  }

  test("errorCategories classifies pairs like eval_utils.py:247-307") {
    val s = spark
    import s.implicits._
    val schema = Seq(
      ("c", "a", true, false), ("c", "b", true, false),
      ("c", "t_a", false, true), ("c", "t_b", false, true)
    ).toDF("case_id", "col", "in_src", "in_tgt")
    val preds = Seq(
      ("c", "a", "t_a"),   // valid — short-circuits the error checks
      ("c", "a", "a"),     // same schema + same attribute
      ("c", "a", "b"),     // same schema (both source)
      ("c", "t_a", "t_b"), // same schema (both target)
      ("c", "x", "y"),     // invalid attr counts PER SIDE: +2
      ("c", "x", "t_a"),   // invalid first: +1
      ("c", "a", "z")      // invalid second: +1, NOT same-schema
    ).toDF("case_id", "first", "second")
    val r = Metrics.errorCategories(preds, schema).head()
    assert(r.getAs[Long]("n_valid") == 1)
    assert(r.getAs[Long]("n_invalid_attr") == 4)
    assert(r.getAs[Long]("n_same_schema") == 3)
    assert(r.getAs[Long]("n_same_attr") == 1)
  }

  test("errorCategories: a name in BOTH schemas must not fan predictions out") {
    val s = spark
    import s.implicits._
    // 'id' arrives as two membership rows (src + tgt) — the union shape
    // q59 builds; the operator must collapse them before joining
    val schema = Seq(
      ("c", "id", true, false), ("c", "id", false, true),
      ("c", "t_x", false, true)
    ).toDF("case_id", "col", "in_src", "in_tgt")
    val preds = Seq(
      ("c", "id", "t_x"), // valid: first in src, second in tgt — exactly once
      ("c", "id", "id")   // valid too (id is in tgt): NOT a same-attr error
    ).toDF("case_id", "first", "second")
    val r = Metrics.errorCategories(preds, schema).head()
    assert(r.getAs[Long]("n_valid") == 2, s"fan-out inflated counts: $r")
    assert(r.getAs[Long]("n_invalid_attr") == 0)
    assert(r.getAs[Long]("n_same_schema") == 0)
    assert(r.getAs[Long]("n_same_attr") == 0)
  }
}
