package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Training corpora scraped from the web mix composed ("é" U+00E9) and
  * decomposed ("e" + U+0301) forms of the same visible text; every dedup
  * hash, shingle, and equality join upstream treats them as different
  * documents unless a canonicalization pass runs first. Spark has no
  * built-in for this (the `lower`/`trim`/`regexp_replace` kernel can't
  * express it), so per SURVEY §7.3's preference order it is a custom
  * scalar Expression rather than a UDF: null-safe, codegen'd (the JDK
  * normalizer call sits inside whole-stage codegen like any other string
  * kernel — no interpreted-lambda or serialization boundary).
  *
  * `Normalizer.Form.NFC` is the Unicode-standard canonical composition;
  * DuckDB's `nfc_normalize` implements the same algorithm, which is what
  * makes the q180 oracle an exact cross-engine replay.
  *
  * SQL surface: `nfc_normalize(string) -> string`.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Unrestricted Damerau-Levenshtein distance as a native Catalyst
  * expression — the record-linkage verify kernel (typo'd entity names are
  * dominated by adjacent transpositions: "widgte" ~ "widget" is distance 1
  * here but 2 for plain Levenshtein, which Spark's built-in computes).
  * Spark has `levenshtein` but no transposition-aware variant; per SURVEY
  * §7.3's preference order this is a scalar Expression (null-safe, inside
  * whole-stage codegen), not a UDF.
  *
  * UNRESTRICTED variant (a substring may be edited after a transposition),
  * computed over UTF-8 BYTES — both choices match DuckDB's
  * `damerau_levenshtein` exactly ('ca'→'abc' = 2 where the restricted
  * OSA gives 3; 'é'→'e' = 2 bytes), which is what makes the q199 oracle an
  * exact integer cross-engine replay. Textbook DP with a 256-slot
  * last-seen-byte table; O(|a|·|b|) time/space per row, row-local.
  *
  * SQL surface: `damerau_levenshtein(string, string) -> int`.
  */
final case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextKernels.damerauLevenshtein(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextKernels.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** Jaro-Winkler similarity as a native Catalyst expression — the OTHER
  * classic record-linkage kernel beside [[DamerauLevenshtein]]: edit
  * distance prices whole-string surgery, Jaro-Winkler prices shared
  * characters within a sliding window plus a common-prefix boost, which
  * is the signal that matters for entity NAMES ("Jonathon Smith" vs
  * "Jonathan Smith"). Spark has no built-in; per SURVEY §7.3's preference
  * order this is a scalar Expression (null-safe, inside whole-stage
  * codegen), not a UDF.
  *
  * Float semantics are pinned to DuckDB's `jaro_winkler_similarity` so
  * the q211 oracle is a bit-exact double replay (reverse-engineered
  * empirically, 0/305 ULP mismatches over random pairs):
  *   - matching window `max(|a|,|b|)/2 - 1` (clamped ≥ 0), greedy
  *     first-unused match;
  *   - transpositions as the INTEGER `k/2` (k = aligned matched chars
  *     that differ) — not the half-count float;
  *   - `jaro = (m/|a| + m/|b| + (m-t)/m) / 3` in exactly that
  *     association order;
  *   - Winkler boost `jaro + l·0.1·(1-jaro)` (prefix l ≤ 4) applied only
  *     when `jaro > 0.7` (the classic boost threshold);
  *   - either side empty, or zero matches → 0.0 (note: "" vs "" is 0,
  *     not 1 — DuckDB's convention).
  * Computed over UTF-8 BYTES like [[DamerauLevenshtein]] (identical to
  * code points on the ASCII corpus; DuckDB's kernel is byte-level too).
  * O(|a|·window) time, two small boolean scratch arrays, row-local.
  *
  * SQL surface: `jaro_winkler(string, string) -> double`.
  */
final case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextKernels.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object TextKernels {

  /** Shared by interpreted eval and generated code. See [[JaroWinkler]]
    * for the exact float-semantics contract this implements.
    */
  def jaroWinkler(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.getBytes
    val b = sb.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + win)
      var j = math.max(0, i - win)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!mb(j) && a(i) == b(j)) { ma(i) = true; mb(j) = true; m += 1; unmatched = false }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var j2 = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j2)) j2 += 1
        if (a(i) != b(j2)) k += 1
        j2 += 1
      }
      i += 1
    }
    val t = k / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (m - t).toDouble / m) / 3.0
    var l = 0
    val maxp = math.min(4, math.min(la, lb))
    while (l < maxp && a(l) == b(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }

  /** Shared by interpreted eval and generated code. Byte-level unrestricted
    * Damerau-Levenshtein (see [[DamerauLevenshtein]] for why bytes).
    */
  def damerauLevenshtein(sa: UTF8String, sb: UTF8String): Int = {
    val a = sa.getBytes
    val b = sb.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2); row i+1/col j+1 hold prefix lengths i/j
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val lastA = new Array[Int](256) // last row where byte value occurred in a
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = lastA(b(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      lastA(a(i - 1) & 0xff) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }

  /** Shared by interpreted eval and generated code. Fast path: NFC
    * normalization is the identity on pure-ASCII input (the overwhelming
    * majority of web text), and `isNormalized` is a cheap scan that
    * avoids allocating for already-composed strings.
    */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}

object TextExpressions {

  private val info = new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize")

  private def builder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "nfc_normalize takes exactly 1 argument")
    NfcNormalize(args.head)
  }

  private val dlInfo =
    new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein")

  private def dlBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "damerau_levenshtein takes exactly 2 arguments")
    DamerauLevenshtein(args(0), args(1))
  }

  private val jwInfo =
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler")

  private def jwBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "jaro_winkler takes exactly 2 arguments")
    JaroWinkler(args(0), args(1))
  }

  /** Register into an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"), info, builder(_))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("damerau_levenshtein"), dlInfo, dlBuilder(_))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"), jwInfo, jwBuilder(_))
  }
}
