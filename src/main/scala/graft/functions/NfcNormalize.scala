package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — canonical composition
  * (e + U+0301 → é), the first step of any web-text cleanup pipeline and
  * a prerequisite for exact-hash dedup: NFC-equal texts that differ in
  * combining-mark order would otherwise hash apart (d01) and shingle
  * apart (d03).
  *
  * Spark has no built-in for this; DuckDB's `nfc_normalize` gives the
  * cross-engine oracle (NFC is a Unicode-standard bijection on assigned
  * codepoints, so two independent implementations agree).
  *
  * Real codegen (no CodegenFallback — whole-stage fusion survives), and
  * an ASCII fast path on the raw UTF-8 bytes: NFC is the identity on
  * ASCII, so the overwhelmingly common case costs one byte scan with no
  * String materialization and returns the input buffer unchanged.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column): Column = GraftGlue.toCol(NfcNormalize(GraftGlue.toExpr(c)))

  /** Static helper invoked from both interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0x80) != 0) {
        val str = s.toString
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s // pure ASCII: NFC is the identity
  }
}
