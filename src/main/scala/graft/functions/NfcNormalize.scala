package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * Catalyst expression — the text-cleaning step a multilingual corpus
  * pipeline runs before hashing/dedup so that `e` + COMBINING ACUTE and
  * the precomposed `é` hash identically. Backed by `java.text.Normalizer`
  * (JDK-built-in, no extra dependency); DuckDB's `nfc_normalize`
  * implements the same UAX #15 algorithm, so results are oracle-checkable
  * cross-engine. Codegen emits the Normalizer call directly — the
  * expression stays inside whole-stage codegen.
  */
object NfcNormalize {
  def normalize(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(NfcNormalize.normalize(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.NfcNormalize.normalize($c.toString()))")
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
