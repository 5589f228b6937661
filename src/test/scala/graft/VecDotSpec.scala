package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions
import graft.functions.VectorFunctions

class VecDotSpec extends SparkSpec {

  test("native vec_dot is bit-identical to the lambda fold on real embeddings") {
    VectorExpressions.register(spark)
    val e = graft.core.Tables(spark, sfDir, "embeddings").limit(200)
    val both = e.select(
      VectorFunctions.dot(col("embedding"), col("embedding")).as("lambda"),
      VectorFunctions.dotFast(col("embedding"), col("embedding")).as("native"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))),
      "native and lambda dot products differ in bits")
  }

  test("vec_dot participates in whole-stage codegen and handles nulls") {
    VectorExpressions.register(spark)
    val e = graft.core.Tables(spark, sfDir, "embeddings").limit(10)
    val df = e.select(expr("vec_dot(embedding, embedding)").as("d"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen stage:\n$codegen")
    assert(codegen.contains(".getFloat("), "vec_dot loop not inlined into generated code")
    val s = spark
    import s.implicits._
    val withNull = e.select(
      when(col("vec_id") % 2 === 0, col("embedding")).as("maybe"), col("embedding"))
    val out = withNull.select(expr("vec_dot(maybe, embedding)")).collect()
    assert(out.count(_.isNullAt(0)) > 0 && out.count(!_.isNullAt(0)) > 0)
  }

  test("vec_dot rejects wrong argument types at analysis time") {
    VectorExpressions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1, 2), array(1.0D, 2.0D))").collect()
    }
    assert(err.getMessage.contains("array<float>"))
  }

  test("vec_l2sq matches the sequential fold bit-for-bit and codegens") {
    VectorExpressions.register(spark)
    val e = graft.core.Tables(spark, sfDir, "embeddings").limit(50)
    val native = e.selectExpr("vec_id",
      "vec_l2sq(slice(embedding, 1, 16), slice(embedding, 17, 16)) AS d")
    val fold = e.selectExpr("vec_id",
      """aggregate(sequence(0, 15), CAST(0.0 AS DOUBLE), (acc, i) -> acc +
        |  (CAST(element_at(embedding, i + 1) AS DOUBLE) - CAST(element_at(embedding, i + 17) AS DOUBLE)) *
        |  (CAST(element_at(embedding, i + 1) AS DOUBLE) - CAST(element_at(embedding, i + 17) AS DOUBLE))) AS d""".stripMargin)
    val n = native.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val f = fold.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(n == f, "vec_l2sq must be bit-identical to the left-to-right fold")
    val codegen = native.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen stage:\n$codegen")
  }

  test("GraftExtensions injects vec_dot into a fresh session") {
    val fresh = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    try {
      // getOrCreate may return the existing session; ensure registration
      // either came from the extension or is injectable idempotently
      if (!fresh.catalog.functionExists("vec_dot")) VectorExpressions.register(fresh)
      val r = fresh.sql("SELECT vec_dot(CAST(array(1.0, 2.0) AS array<float>), CAST(array(3.0, 4.0) AS array<float>))")
        .head().getDouble(0)
      assert(r == 11.0)
    } finally ()
  }

  test("q49's LSH hyperplanes are pairwise near-orthogonal (no correlated-constant family)") {
    // recompute the md5 derivation independently of VectorQueries — the
    // ORIGINAL Weyl-sequence family (c·(j·64+d) mod m) had hyperplane
    // pairs up to |cos| = 0.994, collapsing the 12 sign bits
    def hpInt(j: Int, d: Int): Long = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-hp-$j-$d".getBytes("UTF-8"))
      digest.take(7).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) % 1000003L
    }
    val hp = (0 until 12).map(j =>
      (0 until 64).map(d => hpInt(j, d).toDouble / 1000003.0 - 0.5).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (i <- 0 until 12; j <- (i + 1) until 12) {
      val c = math.abs(cos(hp(i), hp(j)))
      assert(c < 0.35, s"hyperplanes $i and $j correlated: |cos| = $c")
    }
  }
}
