package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization.
  *
  * Spark ships no normalization builtin, so the usual route is a Scala UDF —
  * a serialization boundary that breaks whole-stage codegen for every row of
  * a 100 TB text corpus. This stays an Expression: codegen emits a static
  * call inside the surrounding WSCG stage, with a fast path that returns the
  * input buffer untouched when it is already NFC (the overwhelmingly common
  * case for real corpora — `Normalizer.isNormalized` is a cheap scan that
  * allocates nothing).
  *
  * Cross-engine contract: DuckDB's `nfc_normalize(s)` implements the same
  * Unicode normalization form, so ops built on this expression stay
  * hash-gateable (see TextOps4.tNfcNormalize).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_norm expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_norm"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static helper shared by eval and codegen. Returns the input UTF8String
    * unchanged (no copy) when already normalized. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Column-API entry points for the string expressions. */
object Str {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Codegen'd Unicode NFC normalization (DuckDB parity: nfc_normalize). */
  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
