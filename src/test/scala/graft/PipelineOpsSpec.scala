package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.ops.{Ensemble, PromptRenderer}
import graft.core.Model._

class SamplingSpec extends SparkSpec {

  private def lineitem = graft.core.Tables(spark, sfDir, "lineitem")

  test("uniform per-group sample: exact n, subset, deterministic across partitioning") {
    val a = Sampling.uniformPerGroup(lineitem, Seq("l_returnflag"), 5, seed = 42,
      keyCols = Seq("l_orderkey", "l_linenumber"))
      .select("l_returnflag", "l_orderkey", "l_linenumber").collect().toSet
    val b = Sampling.uniformPerGroup(lineitem.repartition(13), Seq("l_returnflag"), 5, seed = 42,
      keyCols = Seq("l_orderkey", "l_linenumber"))
      .select("l_returnflag", "l_orderkey", "l_linenumber").collect().toSet
    assert(a == b, "sample must not depend on physical partitioning")
    assert(a.groupBy(_.getString(0)).forall(_._2.size == 5))
  }

  test("datasetSplit: partition-invariant labels, full coverage, sane fractions") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    def labels(df: org.apache.spark.sql.DataFrame) =
      Sampling.datasetSplit(df, seed = 13, keyCols = Seq("doc_id"))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = labels(docs)
    val b = labels(docs.repartition(11)) // randomSplit would re-deal here
    assert(a == b, "split labels must not depend on physical partitioning")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    val n = a.size.toDouble
    val train = a.values.count(_ == "train") / n
    assert(train > 0.8 && train < 0.98, s"train fraction off: $train")
  }

  test("different seeds give different samples") {
    val a = Sampling.distinctValues(lineitem, "l_partkey", 10, seed = 1).collect().toSet
    val b = Sampling.distinctValues(lineitem, "l_partkey", 10, seed = 2).collect().toSet
    assert(a != b)
    assert(a.size == 10 && b.size == 10)
  }

  test("weighted sampling biases toward high weight") {
    val s = spark
    import s.implicits._
    // one heavy value vs many light ones; across seeds the heavy value
    // must be selected far more often than 1/n
    val df = (Seq(("heavy", 1000.0)) ++ (1 to 99).map(i => (s"light$i", 1.0)))
      .toDF("v", "weight").withColumn("g", lit("g"))
    val hits = (1 to 20).count { seed =>
      Sampling.weightedPerGroup(df, Seq("g"), "weight", n = 1, seed = seed, keyCols = Seq("v"))
        .head().getString(0) == "heavy"
    }
    assert(hits >= 15, s"heavy value picked only $hits/20 times")
  }

  test("inverse frequency weights favor rare values; truncate caps length") {
    val s = spark
    import s.implicits._
    val df = Seq("a", "a", "a", "b").toDF("v").withColumn("g", lit("g"))
    val w = Sampling.inverseFrequencyWeights(df, Seq("g"), "v")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(w("b") > w("a"))
    val t = Seq("x" * 150).toDF("v").select(Sampling.truncate(col("v")).as("t"))
      .head().getString(0)
    assert(t.length == 103 && t.endsWith("..."))
  }
}

class EnsembleSpec extends SparkSpec {

  private def preds = {
    val s = spark
    import s.implicits._
    // three runs; (c,q1,a,x) in all, (c,q1,a,y) in two, (c,q2,b,z) in one
    Seq(
      ("c", "q1", "a", "x", 1), ("c", "q1", "a", "x", 2), ("c", "q1", "a", "x", 3),
      ("c", "q1", "a", "y", 1), ("c", "q1", "a", "y", 2),
      ("c", "q2", "b", "z", 3)
    ).toDF("case_id", "query_attr", "src_attr", "tgt_attr", "run_id")
  }

  test("union / intersection / disjoint algebra: disjoint = union − intersection") {
    val u = Ensemble.union(preds).collect().toSet
    val i = Ensemble.intersection(preds, 3).collect().toSet
    val d = Ensemble.disjoint(preds, 3).collect().toSet
    assert(u.size == 3 && i.size == 1 && d.size == 2)
    assert(d == u -- i)
  }

  test("majority keeps the whole tie set at group max") {
    val s = spark
    import s.implicits._
    val tied = Seq(
      ("c", "q", "a", "x", 1), ("c", "q", "a", "x", 2),
      ("c", "q", "a", "y", 2), ("c", "q", "a", "y", 3),
      ("c", "q", "a", "z", 1)
    ).toDF("case_id", "query_attr", "src_attr", "tgt_attr", "run_id")
    val m = Ensemble.majority(tied).select("tgt_attr").collect().map(_.getString(0)).toSet
    assert(m == Set("x", "y"))
  }

  test("yes/no majority requires strictly more yes") {
    val s = spark
    import s.implicits._
    val votes = Seq(
      ("c", "q", "a", "x", "yes"), ("c", "q", "a", "x", "yes"), ("c", "q", "a", "x", "no"),
      ("c", "q", "a", "y", "yes"), ("c", "q", "a", "y", "no")
    ).toDF("case_id", "query_attr", "src_attr", "tgt_attr", "vote")
    val kept = Ensemble.yesNoMajority(votes).select("tgt_attr").collect().map(_.getString(0)).toSet
    assert(kept == Set("x"))
  }
}

class PromptRendererSpec extends SparkSpec {

  private val tc = TestCase("db:t|db2:t2",
    sourceSchema = Seq(ColumnMeta("subject_id", "integer", "patient key", isPk = true),
      ColumnMeta("dob", "timestamp")),
    targetSchema = Seq(ColumnMeta("person_id", "integer")),
    goldMapping = Seq("subject_id" -> "person_id"))

  test("n2one question embeds schema JSON, candidates, and sentinel") {
    val q = PromptRenderer.n2oneQuestion(tc, "person_id",
      Map("subject_id" -> Seq("1", "2")))
    assert(q.prompt.contains(""""name": "subject_id""""))
    assert(q.prompt.contains(""""samples": ["1", "2"]"""))
    assert(q.prompt.contains("- subject_id"))
    assert(q.prompt.contains("- there is no match."))
    assert(q.candidates == Seq("subject_id", "dob"))
  }

  test("schemaJson escapes quotes and newlines") {
    val j = PromptRenderer.schemaJson(Seq(ColumnMeta("a\"b", "text", "line\nbreak")), Map())
    assert(j.contains("a\\\"b") && j.contains("line\\nbreak"))
  }

  test("packIcl keeps demos while the rendered prompt fits the budget") {
    val demos = (1 to 10).map(i => (s"q$i word word", s"a$i"))
    def render(ds: Seq[(String, String)]) = ds.map(d => d._1 + " " + d._2).mkString(" ")
    val kept = PromptRenderer.packIcl(render, demos, maxTokens = 20, maxAnswerTokens = 4)
    assert(kept.size == 4) // 4 demos × 4 tokens + 4 answer tokens = 20
    assert(kept == demos.take(4))
  }

  test("packIcl with the wordpiece counter diverges from whitespace and still budgets") {
    import PromptRenderer.{packIcl, subwordVocab, tokenEstimate, wordpieceCount}
    val wp = wordpieceCount(subwordVocab) _
    // 'interesting' = in+ter+es+t+ing = 5 pieces but ONE whitespace token;
    // the faithful counter must see the explosion the proxy misses
    assert(wp("interesting") == 5)
    assert(tokenEstimate("interesting") == 1)
    // greedy longest-prefix: 'the' (3) beats 'th' (2); unk consumes 1 char
    assert(wp("the") == 1 && wp("xq") == 2)
    val demos = (1 to 10).map(i => (s"interesting", s"thing"))
    def render(ds: Seq[(String, String)]) = ds.map(d => d._1 + " " + d._2).mkString(" ")
    // per demo: interesting(5) + thing(2: th+ing) = 7 pieces; whitespace sees 2
    val keptWp = packIcl(render, demos, maxTokens = 25, maxAnswerTokens = 4,
      countTokens = wp)
    val keptWs = packIcl(render, demos, maxTokens = 25, maxAnswerTokens = 4)
    assert(keptWp.size == 3, s"3×7 + 4 = 25 fits, 4×7 + 4 = 32 does not: ${keptWp.size}")
    assert(keptWs.size == 10, "whitespace proxy accepts everything — the gap under test")
    // the invariant the reference verifies after EACH accept: final prompt
    // + answer budget stays within max for the counter that was used
    assert(wp(render(keptWp)) + 4 <= 25)
  }

  test("nearestDemos ranks by |coverage delta| with id tiebreak") {
    val pool = Seq(("d1", 0.5), ("d2", 0.8), ("d3", 0.45), ("d4", 0.55))
    assert(PromptRenderer.nearestDemos(0.5, pool, 3) == Seq("d1", "d3", "d4"))
  }

  test("lastCharRating reads the trailing digit like the reference") {
    import PromptRenderer.lastCharRating
    assert(lastCharRating("good match, rating: 5") == Some(5))
    assert(lastCharRating("weak: 3") == Some(3))
    // reference's `rate <= 5 or rate >= 0` is always true: 9 passes too
    assert(lastCharRating("9") == Some(9))
    assert(lastCharRating("no rating here") == None)
    assert(lastCharRating("") == None)
    // Unicode decimal digits parse to their VALUE (Python int(s[-1]) parity)
    assert(lastCharRating("rating: ٤") == Some(4))
  }

  test("ratedDemos: rating>=4 filter, stable desc sort, target-case skip, ref off-by-one") {
    import PromptRenderer.{RatedDemo, ratedDemos}
    val pool = Seq(
      RatedDemo("c1", "q1", "a1", "ok 4"),
      RatedDemo("c2", "q2", "a2", "great 5"),
      RatedDemo("c3", "q3", "a3", "poor 2"),    // filtered: rating < 4
      RatedDemo("c4", "q4", "a4", "fine 5"),
      RatedDemo("c5", "q5", "a5", "unparseable"), // filtered: no digit
      RatedDemo("c6", "q6", "a6", "ok 4"))
    // sorted: 5s first in pool order (q2, q4), then 4s (q1, q6);
    // numExample=2 takes 3 (reference `len > num_example` break)
    assert(ratedDemos(pool, targetCaseId = "zz", numExample = 2)
      == Seq(("q2", "a2"), ("q4", "a4"), ("q1", "a1")))
    // target case excluded before the take
    assert(ratedDemos(pool, targetCaseId = "c2", numExample = 2)
      == Seq(("q4", "a4"), ("q1", "a1"), ("q6", "a6")))
  }
}

class MetricsSpec extends SparkSpec {

  test("all-zero counts score perfect 1.0; tp+fn=0 gives recall 0") {
    val s = spark
    import s.implicits._
    val counts = Seq(
      ("allzero", 0.0, 0.0, 0.0, 5.0),
      ("norecallbase", 0.0, 2.0, 0.0, 0.0),
      ("mixed", 2.0, 1.0, 1.0, 0.0)
    ).toDF("k", "tp", "fp", "fn", "tn")
    val m = graft.eval.Metrics.withPrfAccuracyEffort(counts)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("allzero").getDouble(5) == 1.0 && m("allzero").getDouble(6) == 1.0
      && m("allzero").getDouble(7) == 1.0)
    assert(m("norecallbase").getDouble(5) == 0.0) // precision 0 (tp=0, fp>0 → not all-zero)
    assert(m("norecallbase").getDouble(6) == 0.0) // recall, tp+fn=0
    assert(m("mixed").getDouble(5) == 2.0 / 3)
    assert(m("mixed").getDouble(8) == 0.5) // accuracy2 = (2+0)/(2+0+1+1)
    // accuracy (population variant): (tp+tn)/N with external N
    val acc = counts.select(graft.eval.Metrics.accuracyOf(lit(8.0))).collect().map(_.getDouble(0))
    assert(acc.toSeq == Seq(5.0 / 8, 0.0 / 8, 2.0 / 8))
    assert(m("mixed").getDouble(9) == (3 * 1.0 + 1.0) / 3) // effort=(3fn+fp)/(tp+fn)
  }

  test("mean reciprocal rank averages 1/first-gold-rank with 0 for misses") {
    val s = spark
    import s.implicits._
    val ranked = Seq(
      ("q1", "a", 1), ("q1", "b", 2),
      ("q2", "c", 1), ("q2", "d", 2),
      ("q3", "e", 1)
    ).toDF("query", "candidate", "rank")
    val gold = Seq(("q1", "b"), ("q2", "c")).toDF("query", "candidate")
    val mrr = graft.eval.Metrics.meanReciprocalRank(ranked, gold, Seq("query"))
      .head().getDouble(0)
    assert(math.abs(mrr - (0.5 + 1.0 + 0.0) / 3) < 1e-12)
  }

  test("cross-seed CI: mean ± 1.96·sd/√n") {
    val s = spark
    import s.implicits._
    val perSeed = Seq(("g", 0.4), ("g", 0.6)).toDF("grp", "f1")
    val r = graft.eval.Metrics.crossSeedCI(perSeed, Seq("grp"), "f1").head()
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
    val sd = math.sqrt(2 * math.pow(0.1, 2) / 1) // stddev_samp of {0.4,0.6}
    assert(math.abs(r.getDouble(3) - 1.96 * sd / math.sqrt(2)) < 1e-9)
  }
}
