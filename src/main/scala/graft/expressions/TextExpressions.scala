package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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

object TextKernels {
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

  /** Register into an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"), info, builder(_))
}
