package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopK

class TopKSpec extends SparkSpec {

  private def supplier = graft.core.Tables(spark, sfDir, "supplier")

  test("TopK.perKey equals the window row_number formulation") {
    val s = spark
    import s.implicits._
    val viaTopK = TopK.perKey(supplier,
        keyCols = Seq("s_nationkey"),
        order = Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")),
        k = 3)
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey")
    val viaWindow = supplier
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal")
      .collect().map(_.toSeq).toSet
    assert(viaTopK == viaWindow)
  }

  test("physical plan uses the custom exec and needs no sort") {
    val s = spark
    import s.implicits._
    val df = TopK.perKey(supplier, Seq("s_nationkey"),
      Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 2)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(!plan.toLowerCase.contains("sort "), s"unexpected sort in plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), "expected one key shuffle")
  }

  test("results are stable across partitioning (total order provided)") {
    val s = spark
    import s.implicits._
    val a = TopK.perKey(supplier, Seq("s_nationkey"),
        Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 3)
      .collect().map(_.toSeq).toSet
    val b = TopK.perKey(supplier.repartition(13), Seq("s_nationkey"),
        Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("key-only filters push through TopK into the parquet scan (custom rule)") {
    val s = spark
    import s.implicits._
    val df = TopK.perKey(supplier, Seq("s_nationkey"),
        Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 3)
      .filter($"s_nationkey" === 7)
    // the Filter must sit BELOW the TopK node after optimization
    val optimized = df.queryExecution.optimizedPlan.toString().toLowerCase
    assert(optimized.indexOf("topkperkey") >= 0 && optimized.indexOf("filter") >= 0
      && optimized.indexOf("topkperkey") < optimized.indexOf("filter"),
      s"filter not pushed below TopK:\n$optimized")
    // ...and all the way into the scan
    val physical = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(physical.contains("PushedFilters: [IsNotNull(s_nationkey), EqualTo(s_nationkey,7)]")
      || physical.contains("EqualTo(s_nationkey,7)"),
      s"filter did not reach the parquet scan:\n$physical")
    // semantics unchanged: same as filtering the input first
    val direct = TopK.perKey(supplier.filter($"s_nationkey" === 7), Seq("s_nationkey"),
        Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 3)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == direct)
  }

  test("non-key filters are NOT pushed (would change results)") {
    val s = spark
    import s.implicits._
    val df = TopK.perKey(supplier, Seq("s_nationkey"),
        Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 3)
      .filter($"s_acctbal" > 0)
    val optimized = df.queryExecution.optimizedPlan
    // root must still be the Filter (not pushed below the TopK node)
    assert(optimized.getClass.getSimpleName == "Filter",
      s"non-key filter must stay above TopK:\n$optimized")
  }

  test("mixed conjunctions split: key conjunct pushes, the rest stays above") {
    val s = spark
    import s.implicits._
    val df = TopK.perKey(supplier, Seq("s_nationkey"),
        Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 3)
      .filter($"s_nationkey" === 7 && $"s_acctbal" > 0)
    val optimized = df.queryExecution.optimizedPlan
    // top: residual Filter(acctbal); below TopK: pushed key filter
    assert(optimized.getClass.getSimpleName == "Filter")
    val low = optimized.toString().toLowerCase
    assert(low.indexOf("topkperkey") < low.lastIndexOf("filter")
      || low.indexOf("s_nationkey#") > low.indexOf("topkperkey"),
      s"key conjunct not pushed:\n$optimized")
    // the pushed key conjunct reaches the parquet scan
    val physical = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(physical.contains("EqualTo(s_nationkey,7)"),
      s"key conjunct did not reach the scan:\n$physical")
    // semantics: equal to filtering input on key, result on non-key
    val direct = TopK.perKey(supplier.filter($"s_nationkey" === 7), Seq("s_nationkey"),
        Seq(TopK.Order("s_acctbal", ascending = false), TopK.Order("s_suppkey")), 3)
      .filter($"s_acctbal" > 0).collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == direct)
  }

  test("k larger than group size returns whole groups in rank order") {
    val s = spark
    import s.implicits._
    val nat = graft.core.Tables(spark, sfDir, "nation")
    val out = TopK.perKey(nat, Seq("n_regionkey"), Seq(TopK.Order("n_name")), 1000)
      .select($"n_regionkey", $"n_name").collect()
    assert(out.length == nat.count())
    // within each region, names come back ascending
    val grouped = out.groupBy(_.getInt(0)).values
    assert(grouped.forall(g => g.map(_.getString(1)).toSeq == g.map(_.getString(1)).toSeq.sorted))
  }
}
