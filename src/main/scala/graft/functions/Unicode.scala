package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical composition (NFC) as a native codegen expression —
  * Spark SQL has no normalization builtin, and an ingestion pipeline
  * must canonicalize before ANY content hashing (q09's digests, q10's
  * shingles): "é" and "e"+U+0301 are byte-distinct but render
  * identically, so un-normalized corpora silently miss duplicates and
  * double-count vocabulary. Same three-surface layout as
  * [[PatternMask]]: plain function, codegen expression, Column helper.
  *
  * The ASCII fast path skips the Normalizer entirely — the common case
  * at corpus scale; `Normalizer.isNormalized` handles the rest without
  * allocating when the value is already composed. JVM NFC and DuckDB's
  * utf8proc NFC agree on canonical composition (both implement UAX #15;
  * the q155 gate hash-checks that agreement on the fixture's
  * combining-sequence overlay).
  */
object Unicode {

  def nfc(value: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < value.length) { ascii = value.charAt(i) < 128; i += 1 }
    if (ascii || java.text.Normalizer.isNormalized(
        value, java.text.Normalizer.Form.NFC)) value
    else java.text.Normalizer.normalize(value, java.text.Normalizer.Form.NFC)
  }

  /** Entry point called from generated code. */
  def nfcUtf8(value: UTF8String): UTF8String = {
    val s = value.toString
    val n = nfc(s)
    if (n eq s) value else UTF8String.fromString(n)
  }

  def nfc_normalize(c: Column): Column =
    SqlShims.column(NfcNormalizeExpression(SqlShims.expression(c)))
}

case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Unicode.nfcUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Unicode.nfcUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
