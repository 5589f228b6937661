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
