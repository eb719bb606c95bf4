package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All four repetition quality signals (Gopher/C4-style boilerplate
  * detectors) in ONE pass over the document's UTF-8 bytes:
  *
  *  - n_lines, dup_line_frac ('\n'-split, trailing empties kept —
  *    `split` semantics);
  *  - top_word_frac (max whitespace-token multiplicity / tokens);
  *  - dup_bigram_frac (1 − distinct word bigrams / bigrams).
  *
  * Value-equal to the composed pipeline (split + regexp_extract_all
  * ×2 + array_distinct ×2 + the explode→two-level-agg top-word join
  * in [[graft.operators.TextAnalysis.repetitionSignalsComposed]]),
  * spec-pinned on the corpus: same double arithmetic, token identity
  * by 64-bit hash exactly as the composed top-word path already
  * hashes, bigram identity (hash pair) ≡ string identity because
  * tokens cannot contain the joining space. The composed plan scans
  * the text three times with regex and shuffles (id, token-hash)
  * pairs; this is a pure projection — no regex, no shuffle — so the
  * operator scales with the scan.
  *
  * Tokens are maximal runs of bytes outside Java regex `\s` =
  * [ \t\n\x0B\f\r] (ASCII-only, as `\S+` matches by default);
  * multi-byte UTF-8 units are ≥ 0x80 and never split a token.
  */
case class RepetitionSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("top_word_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_signals requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionSignals.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RepetitionSignals.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionSignals {
  private val Seed = 42L

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Sorts in place and returns the distinct count. */
  private def distinctCount(a: Array[Long], len: Int): Int = {
    java.util.Arrays.sort(a, 0, len)
    var m = 0
    var i = 0
    while (i < len) {
      if (i == 0 || a(i) != a(i - 1)) m += 1
      i += 1
    }
    m
  }

  /** Sorts in place and returns the longest run (max multiplicity). */
  private def maxRun(a: Array[Long], len: Int): Int = {
    java.util.Arrays.sort(a, 0, len)
    var best = 0
    var run = 0
    var i = 0
    while (i < len) {
      if (i == 0 || a(i) != a(i - 1)) run = 1 else run += 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length

    // '\n'-separated segments, trailing empties kept (split semantics)
    var nLines = 1
    var i = 0
    while (i < n) { if (bytes(i) == '\n') nLines += 1; i += 1 }
    val lineHashes = new Array[Long](nLines)
    var li = 0
    var segStart = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        lineHashes(li) = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + segStart, i - segStart, Seed)
        li += 1
        segStart = i + 1
      }
      i += 1
    }

    // whitespace tokens: hashes in document order
    var nToks = 0
    i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        nToks += 1
        while (i < n && !isWs(bytes(i))) i += 1
      } else i += 1
    }
    val tokHashes = new Array[Long](nToks)
    var ti = 0
    i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        tokHashes(ti) = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        ti += 1
      } else i += 1
    }

    // bigram hashes from the in-order token hashes (pair identity ≡
    // the composed path's space-joined string identity)
    val nBigrams = math.max(nToks - 1, 0)
    val bigramHashes = new Array[Long](nBigrams)
    i = 0
    while (i < nBigrams) {
      bigramHashes(i) = XXH64.hashLong(tokHashes(i + 1), tokHashes(i))
      i += 1
    }

    val dupLineFrac =
      1.0 - distinctCount(lineHashes, nLines).toDouble / nLines.toDouble
    val topWordFrac =
      if (nToks > 0) maxRun(tokHashes, nToks).toDouble / nToks.toDouble else 0.0
    val dupBigramFrac =
      if (nBigrams > 0)
        1.0 - distinctCount(bigramHashes, nBigrams).toDouble / nBigrams.toDouble
      else 0.0

    new GenericInternalRow(Array[Any](
      nLines.toLong, dupLineFrac, topWordFrac, dupBigramFrac))
  }
}

object RepetitionExpression {
  /** Column wrapper: struct(n_lines, dup_line_frac, top_word_frac,
    * dup_bigram_frac) in one pass.
    */
  def repetitionSignals(text: Column): Column =
    ColumnBridge.column(RepetitionSignals(ColumnBridge.expression(text)))
}
