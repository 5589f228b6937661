package graft

import org.apache.spark.sql.functions._
import graft.expressions.TextExpressions

class NfcNormalizeSpec extends SparkSpec {

  // explicit code points so the source file's own encoding can't blur the
  // composed-vs-decomposed distinction under test
  private val eAcuteComposed = "\u00e9"
  private val eAcuteDecomposed = "e\u0301"
  private val aGraveComposed = "\u00c0"
  private val aGraveDecomposed = "A\u0300"

  test("nfc_normalize composes decomposed sequences and is identity on NFC text") {
    TextExpressions.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", eAcuteDecomposed),
      ("b", eAcuteComposed),
      ("c", aGraveDecomposed + "ffin"),
      ("d", "plain ascii"),
      ("e", "")
    ).toDF("id", "t")
    val out = df.select($"id", expr("nfc_normalize(t)").as("n")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") == eAcuteComposed)
    assert(out("b") == eAcuteComposed)
    assert(out("c") == aGraveComposed + "ffin")
    assert(out("d") == "plain ascii")
    assert(out("e") == "")
  }

  test("nfc_normalize is null-safe and participates in whole-stage codegen") {
    TextExpressions.register(spark)
    val s = spark
    import s.implicits._
    // parquet-backed source: a local Seq relation is constant-folded by
    // ConvertToLocalRelation (interpreted eval, no codegen stage at all)
    val docs = graft.core.Tables(spark, sfDir, "documents").limit(20)
    val df = docs
      .select($"doc_id", $"text",
        when($"doc_id" % 2 === 0, $"text").as("maybe"))
      .select(
        call_function("nfc_normalize",
          concat($"text", lit(eAcuteDecomposed))).as("n"),
        expr("nfc_normalize(maybe)").as("nm"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen stage:\n$codegen")
    assert(codegen.contains("TextKernels"), "kernel call not inlined into generated code")
    val out = df.collect()
    assert(out.count(_.isNullAt(1)) > 0 && out.count(!_.isNullAt(1)) > 0)
    assert(out.forall(r => r.getString(0).endsWith(eAcuteComposed)))
  }

  test("nfc_normalize rejects non-string arguments at analysis time") {
    TextExpressions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT nfc_normalize(42)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("normalization agrees with java.text.Normalizer on random combining sequences") {
    TextExpressions.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val marks = Seq('̀', '́', '̂', '̈', '̧')
    val base = "aeiouncAEIOUNC"
    val samples = (0 until 200).map { i =>
      val sb = new StringBuilder
      (0 until 1 + rnd.nextInt(12)).foreach { _ =>
        sb.append(base(rnd.nextInt(base.length)))
        if (rnd.nextBoolean()) sb.append(marks(rnd.nextInt(marks.length)))
      }
      (i, sb.toString)
    }
    val got = samples.toDF("i", "t")
      .select($"i", expr("nfc_normalize(t)").as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    samples.foreach { case (i, t) =>
      val expected = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(got(i) == expected, s"mismatch on sample $i: '$t'")
    }
  }

  test("damerau_levenshtein: unrestricted semantics, byte-level, metric properties") {
    import graft.expressions.TextKernels.{damerauLevenshtein => dl}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // the case separating unrestricted DL from restricted OSA: 'ca'→'abc'
    // is 2 (transpose to 'ac', insert 'b' INSIDE the transposed pair —
    // OSA forbids that and answers 3). DuckDB implements unrestricted.
    assert(dl(u("ca"), u("abc")) == 2)
    assert(dl(u("a cat"), u("an abct")) == 3)
    assert(dl(u("widgte"), u("widget")) == 1) // adjacent transposition
    assert(dl(u("widgte"), u("widget")) <
      u("widgte").levenshteinDistance(u("widget")))
    assert(dl(u(""), u("abc")) == 3 && dl(u("abc"), u("")) == 3)
    assert(dl(u(""), u("")) == 0)
    // byte-level (matches DuckDB): é is 2 UTF-8 bytes from e
    assert(dl(u("é"), u("e")) == 2)
    // randomized metric properties + agreement with a brute-force check
    // that DL ≤ lev always and DL ≥ lev - transposition count bound
    val rnd = new scala.util.Random(11)
    def rs() = (0 until rnd.nextInt(9)).map(_ => "abcd"(rnd.nextInt(4))).mkString
    (0 until 2000).foreach { _ =>
      val (a, b, c) = (rs(), rs(), rs())
      val (ab, ba) = (dl(u(a), u(b)), dl(u(b), u(a)))
      assert(ab == ba, s"symmetry failed: '$a' '$b'")
      assert(ab >= 0 && (ab == 0) == (a == b), s"identity failed: '$a' '$b'")
      assert(ab <= math.max(a.length, b.length), s"bound failed: '$a' '$b'")
      assert(ab <= u(a).levenshteinDistance(u(b)),
        s"DL > levenshtein on '$a' '$b'")
      assert(dl(u(a), u(c)) <= ab + dl(u(b), u(c)),
        s"triangle inequality failed: '$a' '$b' '$c'")
    }
  }

  test("damerau_levenshtein is null-safe and runs inside whole-stage codegen") {
    TextExpressions.register(spark)
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dlspec").toString
    Seq(("ca", "abc"), (null, "x"), ("x", null), ("same", "same"))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
      .selectExpr("a", "b", "damerau_levenshtein(a, b) AS d")
    val codegen = out.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen stage:\n$codegen")
    assert(codegen.contains("TextKernels"),
      "kernel call not inlined into generated code")
    val got = out.collect().map(r =>
      (Option(r.getString(0)), Option(r.getString(1))) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(got((Some("ca"), Some("abc"))) == Some(2))
    assert(got((None, Some("x"))) == None)
    assert(got((Some("x"), None)) == None)
    assert(got((Some("same"), Some("same"))) == Some(0))
  }
}
