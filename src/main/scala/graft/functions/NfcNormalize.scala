package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * text-cleaning step that makes byte-level dedup and hashing see
  * "café" (precomposed U+00E9) and "café" (e + combining U+0301) as
  * the same document. Backed by the JDK's `java.text.Normalizer`
  * (Unicode-stable: NFC results for assigned codepoints do not change
  * across Unicode versions, which is what lets DuckDB's
  * nfc_normalize replay it in the oracle).
  *
  * The fast path skips allocation entirely: `Normalizer.isNormalized`
  * is a cheap scan, and real-world corpora are overwhelmingly already
  * NFC, so most rows never materialize a new string.
  */
object NfcText {
  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcText.nfc($c)")
  override def nullSafeEval(v: Any): Any =
    NfcText.nfc(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression)
      : NfcNormalize = copy(child = c)
}

object NfcNormalize {
  def apply(text: Column): Column =
    ColumnGlue.column(NfcNormalize(ColumnGlue.expression(text)))
}
