package graft

import graft.ops.ScoreFusion

class ScoreFusionSpec extends SparkSpec {

  private def fwd = {
    val s = spark
    import s.implicits._
    Seq(("c", "a", "x", 0.8), ("c", "a", "y", 0.4), ("c", "b", "x", 0.0))
      .toDF("case_id", "src_attr", "tgt_attr", "score")
  }
  private def bwd = {
    val s = spark
    import s.implicits._
    Seq(("c", "a", "x", 0.6), ("c", "b", "z", 0.5))
      .toDF("case_id", "src_attr", "tgt_attr", "score")
  }

  test("avg fusion: full-outer, missing side = 0, zero combined dropped") {
    val r = ScoreFusion.avgLogits(fwd, bwd, ScoreFusion.Average)
      .collect().map(x => (x.getString(1), x.getString(2)) -> x.getDouble(5)).toMap
    assert(math.abs(r(("a", "x")) - 0.7) < 1e-12)           // both sides
    assert(math.abs(r(("a", "y")) - 0.2) < 1e-12)           // fwd only
    assert(math.abs(r(("b", "z")) - 0.25) < 1e-12)          // bwd only
    assert(!r.contains(("b", "x")))                          // 0+0 dropped
  }

  test("multiply fusion keeps only both-direction agreement") {
    val r = ScoreFusion.avgLogits(fwd, bwd, ScoreFusion.Multiply)
      .collect().map(x => (x.getString(1), x.getString(2)) -> x.getDouble(5)).toMap
    assert(r.keySet == Set(("a", "x")))                      // one-sided → 0 → dropped
    assert(math.abs(r(("a", "x")) - 0.48) < 1e-12)
  }

  test("confidence post-processing: normalize, sentinel tracking, zero drop") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      ("c", "q", "optA", 85), ("c", "q", "optB", 0),
      ("c", "q", "None of the options", 100),
      ("c", "q2", "optC", 250) // clamped to 100
    ).toDF("case_id", "query_attr", "cand_attr", "raw_score")
    val out = ScoreFusion.postprocessConfidence(raw).collect()
      .map(r => (r.getString(1), r.getString(2)) -> (r.getDouble(3), r.getInt(4), r.getInt(5))).toMap
    assert(out(("q", "optA")) == ((0.85, 0, 1)))  // sentinel scored 100 → score_100=1
    assert(!out.contains(("q", "optB")))           // zero dropped
    assert(!out.exists(_._1._2.toLowerCase.contains("none")))
    assert(out(("q2", "optC")) == ((1.0, 0, 0)))   // clamped, no sentinel row
  }

  test("case-id categorizer splits db:table|db:table") {
    val s = spark
    import s.implicits._
    val df = Seq(("mimic-iii:ADMISSIONS|omop:VISIT_OCCURRENCE", 1)).toDF("case_id", "v")
    val r = ScoreFusion.caseDims(df).head()
    assert(r.getString(2) == "mimic-iii" && r.getString(3) == "ADMISSIONS")
    assert(r.getString(4) == "omop" && r.getString(5) == "VISIT_OCCURRENCE")
  }
}
