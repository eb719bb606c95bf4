package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a text column — the classic
  * boilerplate/repetition quality signal (highly compressible text is
  * template or repeated content; natural prose sits around 0.4–0.7):
  * `deflate(utf8(text)).length / utf8(text).length`, raw deflate at
  * BEST_SPEED with no zlib header.
  *
  * Native expression, not a UDF: one pass per row inside whole-stage
  * codegen. The compressed STREAM is never materialized — the
  * deflater drains into a fixed scratch buffer and only the byte
  * count survives, so memory is O(buffer), not O(document).
  *
  * Deterministic for a fixed JDK (deflate output is a pure function
  * of input, level, and strategy). Treat it as an advisory signal,
  * not an oracle-checkable value: another zlib build may emit a
  * slightly different (still valid) stream, so specs pin ordering
  * properties and run-to-run determinism rather than exact bytes.
  * Empty text → 1.0 (incompressible by convention); null → null.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"compression_ratio requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    CompressionRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CompressionRatio.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionRatio {

  // one deflater + scratch buffer per task thread, reset between rows:
  // a per-row Deflater means a native allocation and finalizer per
  // document — real GC/native pressure at billions of rows
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Column wrapper. */
  def compressionRatio(text: Column): Column =
    ColumnBridge.column(CompressionRatio(ColumnBridge.expression(text)))
}
