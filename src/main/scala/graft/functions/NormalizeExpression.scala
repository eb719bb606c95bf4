package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup/quality pipelines in one
  * codegen'd projection: Unicode NFC composition → ROOT-locale
  * lowercase → collapse ASCII whitespace runs ([ \t\n\x0B\f\r]) to a
  * single space → trim. Normalizing BEFORE fingerprinting/shingling
  * is what makes byte-level dedup robust to encoding and spacing
  * variants of the same text.
  *
  * Spark has no NFC built-in (lower + regexp_replace covers the
  * rest), hence a native expression rather than a UDF: null-safe,
  * codegen-friendly, and the NFC fast path (`isNormalized`, true for
  * all-ASCII) skips the normalizer allocation entirely.
  *
  * The whitespace class is deliberately the ASCII set only — the
  * same class the repo's tokenizers use (Java regex `\s`) — so
  * normalize-then-tokenize and tokenize-then-normalize agree; it is
  * also expressible identically in RE2 for the DuckDB oracle
  * (`[ \t\n\x0b\f\r]+`), where Java's `\s` vs RE2's `\s` would
  * disagree on vertical tab.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"normalize_text requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeText.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val low = nfc.toLowerCase(java.util.Locale.ROOT)
    val n = low.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = low.charAt(i)
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object NormalizeExpression {
  /** Column wrapper: NFC + lowercase + whitespace collapse + trim. */
  def normalizeText(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))
}
