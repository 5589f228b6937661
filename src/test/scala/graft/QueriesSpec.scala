package graft

/** Every registered query must run at sf0.001, produce a stable schema, and
  * be deterministic across two executions (the driver's oracle gate hashes
  * values — a nondeterministic query can never pass it).
  */
class QueriesSpec extends SparkSpec {

  test("every query has an entry and queries/oracleSql keys line up") {
    assert(SparkEntry.queries.nonEmpty)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every multi-row query ends in a global ORDER BY (driver gate requirement)") {
    import org.apache.spark.sql.catalyst.plans.logical._
    // single-row aggregates are order-free by construction
    val singleRow = Set("q15_uniqueness_audit", "q16_constraint_audit", "q37_overlap_eval")
    // the sort must be the TOP-MOST operator modulo order-preserving
    // wrappers — a sort buried under a groupBy would not order the result
    @annotation.tailrec
    def endsInSort(p: LogicalPlan): Boolean = p match {
      case s: Sort => s.global
      case _: Project | _: GlobalLimit | _: LocalLimit | _: SubqueryAlias =>
        endsInSort(p.children.head)
      case _ => false
    }
    val missing = SparkEntry.queries.toSeq.collect {
      case (name, fn) if !singleRow.contains(name) =>
        (name, endsInSort(fn(spark, sfDir).queryExecution.analyzed))
    }.filterNot(_._2).map(_._1)
    assert(missing.isEmpty, s"queries whose final operator is not a global sort: $missing")
  }

  test("rows-only queries match their golden sf0.001 row counts") {
    // these have no DuckDB oracle (mock LLM / seeded sampling / streaming),
    // so pin their cardinality to catch silent semantic drift
    val golden = Map(
      "q34_matching_pipeline" -> 5L,
      "q35_stable_matching" -> 39L,
      "q36_weighted_sample" -> 15L,
      "q38_multimodal_features" -> 500L,
      "q39_streaming_sessions" -> 945L,
      "q41_streaming_tumbling" -> 868L,
      "q48_icl_pipeline" -> 20L)
    val got = golden.keys.map(n => n -> SparkEntry.queries(n)(spark, sfDir).count()).toMap
    assert(got == golden, s"golden drift: $got")
    // q47's row count is just the number of modes — pin the VALUES so a
    // regression in union/intersection/majority semantics is caught
    val q47 = SparkEntry.queries("q47_ensemble_pipeline")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q47 == Map("union" -> 47L, "intersection" -> 2L, "majority" -> 38L),
      s"q47 golden drift: $q47")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs, is non-degenerate and deterministic") {
      val df1 = fn(spark, sfDir)
      assert(df1.columns.nonEmpty, "no columns")
      assert(df1.columns.forall(c => c == c.toLowerCase), s"non-lowercase column in ${df1.columns.mkString(",")}")
      val r1 = df1.collect().map(_.toSeq.map(String.valueOf))
      val r2 = fn(spark, sfDir).collect().map(_.toSeq.map(String.valueOf))
      assert(r1.length == r2.length, "row count changed between runs")
      assert(r1.zip(r2).forall { case (a, b) => a == b }, "values changed between runs")
      // decimal outputs are forbidden: the driver's stringified compare
      // breaks on trailing zeros (see tools/check.py header)
      val decs = df1.schema.fields.filter(_.dataType.typeName.startsWith("decimal"))
      assert(decs.isEmpty, s"decimal output columns: ${decs.map(_.name).mkString(",")}")
    }
  }
}
