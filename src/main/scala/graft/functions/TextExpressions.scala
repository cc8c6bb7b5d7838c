package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the first
  * cleaning step a multilingual corpus pipeline runs (decomposed
  * accents, compatibility forms, and platform-dependent encodings all
  * collapse to one canonical byte sequence, so exact dedup and shingle
  * hashing see ONE representation of the same text).
  *
  * Spark has no built-in NFC function; the alternatives are a Scala UDF
  * (per-row boxing, opaque to the optimizer) or this: a one-node
  * expression whose eval and codegen share a static call into
  * `java.text.Normalizer`, with an isNormalized fast path so the common
  * already-clean row costs one scan and zero allocation. Registered with
  * the SQL function registry as `nfc_normalize` (GraftExtensions) — the
  * same name DuckDB uses, which is what lets q120's oracle replay the
  * IDENTICAL computation.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.NfcNormalizeExpr.normalize($v)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Shared by eval and codegen. Fast path: already-NFC input returns the
    * same UTF8String, no copy — the overwhelmingly common case in an
    * already-clean corpus. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
