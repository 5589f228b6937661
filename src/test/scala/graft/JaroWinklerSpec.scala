package graft

import org.apache.spark.sql.functions._
import graft.expressions.{TextExpressions, TextKernels}
import org.apache.spark.unsafe.types.UTF8String.{fromString => u}

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    TextKernels.jaroWinkler(u(a), u(b))

  test("jaro_winkler matches DuckDB jaro_winkler_similarity bit-for-bit on goldens") {
    // expected values captured verbatim from DuckDB (the q211 oracle
    // engine); the comparison is EXACT double equality — the whole point
    // of the pinned float semantics is that ranks computed from these
    // doubles replay identically in both engines.
    val goldens = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      // jaro 0.5 with a 2-char common prefix: below the 0.7 boost
      // threshold, so NO Winkler boost is applied
      ("abcdefgh", "abwxyzkl", 0.5),
      ("a", "a", 1.0),
      // window max(2,2)/2-1 = 0 forbids the cross match: zero matches
      ("ab", "ba", 0.0),
      // prefix length 0: boost condition holds but adds nothing
      ("CRATE", "TRACE", 0.7333333333333334),
      ("aaapppp", "", 0.0),
      ("frog", "fog", 0.9249999999999999),
      ("hello world", "helo wrold", 0.9554545454545454),
      ("y", "x", 0.0))
    goldens.foreach { case (a, b, expect) =>
      val got = jw(a, b)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(expect),
        s"'$a' vs '$b': got $got expected $expect")
    }
  }

  test("jaro_winkler metric-ish properties on random strings") {
    val rnd = new scala.util.Random(13)
    def rs() = (0 until rnd.nextInt(12)).map(_ => "abcde"(rnd.nextInt(5))).mkString
    (0 until 3000).foreach { _ =>
      val (a, b) = (rs(), rs())
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"range failed: '$a' '$b' -> $v")
      assert(jw(b, a) == v, s"symmetry failed: '$a' '$b'")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity failed: '$a'")
    }
    // DuckDB convention: empty side (even both) scores 0, not 1
    assert(jw("", "") == 0.0)
    assert(jw("", "xyz") == 0.0 && jw("xyz", "") == 0.0)
  }

  test("jaro_winkler is null-safe and runs inside whole-stage codegen") {
    TextExpressions.register(spark)
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jwspec").toString
    Seq(("MARTHA", "MARHTA"), (null, "x"), ("x", null), ("same", "same"))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
      .selectExpr("a", "b", "jaro_winkler(a, b) AS j")
    val codegen = out.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen stage:\n$codegen")
    assert(codegen.contains("TextKernels"),
      "kernel call not inlined into generated code")
    val got = out.collect().map(r =>
      (Option(r.getString(0)), Option(r.getString(1))) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((Some("MARTHA"), Some("MARHTA"))) == Some(0.9611111111111111))
    assert(got((None, Some("x"))) == None)
    assert(got((Some("x"), None)) == None)
    assert(got((Some("same"), Some("same"))) == Some(1.0))
  }

  test("jaro_winkler rejects non-string arguments at analysis time") {
    TextExpressions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT jaro_winkler(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
