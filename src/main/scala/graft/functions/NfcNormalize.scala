package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, java.text.Normalizer) as a native expression.
  *
  * Spark has no built-in for it, yet it is the FIRST canonicalization
  * step for any multilingual corpus: "é" arrives both composed (U+00E9)
  * and decomposed (e + U+0301) from real crawls, and every byte-level
  * operator downstream — content hashes, shingles, the canonical-dedup
  * digest — silently treats them as different documents. DuckDB ships
  * the same operation as `nfc_normalize`, so ops built on this
  * expression stay oracle-checkable under the same name.
  *
  * ASCII fast path: NFC is the identity on ASCII, so the common case is
  * a zero-copy passthrough (numBytes == numChars check).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    // ASCII (1 byte per char) can never change under NFC
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    val normalized = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    if (normalized.eq(str) || normalized == str) s
    else UTF8String.fromString(normalized)
  }

  /** Column wrapper. */
  def of(c: Column): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(NfcNormalize(b.toExpression(c)))
  }
}
