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
  * call inside the surrounding WSCG stage, with two fast paths — a pure-ASCII
  * byte scan on the raw UTF8String (zero allocation, the dominant case for
  * real corpora), then `Normalizer.isNormalized` (one UTF-16 String
  * allocation but no normalization buffers) before paying for a full
  * normalize.
  *
  * Cross-engine contract: DuckDB's `nfc_normalize(s)` (utf8proc) implements
  * the same normalization form, so ops built on this expression stay
  * hash-gateable (see TextOps4.tNfcNormalize). Caveat: the JDK and utf8proc
  * may track different Unicode VERSIONS — composition tables are stabilized
  * for assigned codepoints, but codepoints unassigned in one version could
  * normalize differently; keep oracle-gated inputs to assigned codepoints.
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
    * unchanged (no copy) when already normalized; ASCII short-circuits on
    * the raw bytes without materializing a String. */
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: every byte's high bit clear => no combining marks,
    // no compositions possible => already NFC. Scans the UTF-8 buffer
    // directly; allocates nothing.
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
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
