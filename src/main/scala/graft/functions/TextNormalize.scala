package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFC Unicode normalization as a native codegen'd Catalyst expression.
  *
  * Web-crawled text mixes composed (U+00E9 "é") and decomposed
  * (e + U+0301) forms of the same characters; every downstream hash —
  * exact dedup, MinHash shingles, winnowing fingerprints, vocabulary
  * counts — treats the two as DIFFERENT strings unless the corpus is
  * normalized first, silently splitting duplicate groups and token
  * statistics. NFC is the canonical-composition form every major pipeline
  * (and the W3C character model) normalizes to.
  *
  * A native expression, not a UDF: stays inside whole-stage codegen (the
  * generated code is one static call on the already-evaluated child
  * value — no row boxing), and the fast path costs one `isNormalized`
  * scan with ZERO allocation for the overwhelmingly-ASCII common case
  * (ICU quick-check; ASCII is NFC by construction). At 100 TB this is a
  * pure narrow scan-time transform. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.normalize($c)")
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
